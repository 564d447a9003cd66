import jax
import jax.numpy as jnp
import numpy as np

from monogs_tpu.models import gaussian_map as gm
from monogs_tpu.models.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip_bitexact(tmp_path):
    key = jax.random.PRNGKey(0)
    m = gm.new_map(32, sh_degree=0)
    leaves = gm.ParamLeaves(
        xyz=jax.random.normal(key, (32, 3)),
        sh=jax.random.normal(key, (32, 1, 3)),
        log_scale=jnp.full((32, 3), -2.5),
        quat=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (32, 1)),
        opa_logit=jnp.zeros((32, 1)),
    )
    m = gm.insert(m, leaves, jnp.int32(20), kf_id=7)
    # take an adam step so moments are nonzero
    g = gm.ParamLeaves(*(jnp.ones_like(p) * 0.1 for p in m.params))
    m = gm.adam_step(m, g, gm.MapHyper(), step=jnp.int32(1))

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(m, path, extra={"iteration_count": 42})
    m2, extra = load_checkpoint(path)

    assert int(extra["iteration_count"]) == 42
    for a, b in zip(jax.tree.leaves(m), jax.tree.leaves(m2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a further identical adam step must produce identical maps (optimizer
    # state survived)
    m_next = gm.adam_step(m, g, gm.MapHyper(), step=jnp.int32(2))
    m2_next = gm.adam_step(m2, g, gm.MapHyper(), step=jnp.int32(2))
    np.testing.assert_array_equal(
        np.asarray(m_next.params.xyz), np.asarray(m2_next.params.xyz)
    )
