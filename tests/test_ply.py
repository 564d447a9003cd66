import os

import jax
import jax.numpy as jnp
import numpy as np

from monogs_tpu.models import gaussian_map as gm
from monogs_tpu.models.ply import load_ply, save_ply


def test_ply_roundtrip(tmp_path):
    key = jax.random.PRNGKey(0)
    n = 37
    m = gm.new_map(64, sh_degree=0)
    leaves = gm.ParamLeaves(
        xyz=jax.random.normal(key, (64, 3)),
        sh=jax.random.normal(key, (64, 1, 3)),
        log_scale=jax.random.normal(key, (64, 3)) * 0.1 - 3.0,
        quat=jax.random.normal(key, (64, 4)),
        opa_logit=jax.random.normal(key, (64, 1)),
    )
    m = gm.insert(m, leaves, jnp.int32(n), kf_id=0)
    path = str(tmp_path / "map.ply")
    save_ply(m, path)
    assert os.path.getsize(path) > 0

    m2 = load_ply(path)
    assert int(m2.n_active) == n
    np.testing.assert_allclose(
        np.asarray(m2.params.xyz[:n]), np.asarray(m.params.xyz[:n]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m2.params.opa_logit[:n]),
        np.asarray(m.params.opa_logit[:n]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(m2.params.quat[:n]), np.asarray(m.params.quat[:n]), rtol=1e-6
    )


def test_ply_roundtrip_sh_degree3(tmp_path):
    key = jax.random.PRNGKey(1)
    n = 10
    m = gm.new_map(16, sh_degree=3)
    leaves = gm.ParamLeaves(
        xyz=jax.random.normal(key, (16, 3)),
        sh=jax.random.normal(key, (16, 16, 3)) * 0.2,
        log_scale=jnp.full((16, 3), -3.0),
        quat=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (16, 1)),
        opa_logit=jnp.zeros((16, 1)),
    )
    m = gm.insert(m, leaves, jnp.int32(n), kf_id=0)
    path = str(tmp_path / "map3.ply")
    save_ply(m, path)
    m2 = load_ply(path)
    assert int(m2.n_active) == n
    assert m2.params.sh.shape[1] == 16
    np.testing.assert_allclose(
        np.asarray(m2.params.sh[:n]), np.asarray(m.params.sh[:n]), rtol=1e-5
    )
