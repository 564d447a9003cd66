"""Full-state checkpointing of the Gaussian map (+ optimizer moments).

The reference has no mid-run checkpointing (SURVEY.md section 5) — only PLY
export of the final map. Because the TPU map is a flat pytree of arrays,
full-fidelity checkpoints (parameters, Adam moments, slot metadata) are a
single npz; a resumed run continues bit-exact where PLY round-trips lose
the optimizer state and slot bookkeeping.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from .gaussian_map import GaussianMap, ParamLeaves, new_map

_LEAF_FIELDS = ("xyz", "sh", "log_scale", "quat", "opa_logit")


def save_checkpoint(m: GaussianMap, path: str, extra: dict | None = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for name in _LEAF_FIELDS:
        arrays[f"params.{name}"] = np.asarray(getattr(m.params, name))
        arrays[f"adam_m.{name}"] = np.asarray(getattr(m.adam_m, name))
        arrays[f"adam_v.{name}"] = np.asarray(getattr(m.adam_v, name))
    for name in ("adam_t", "active", "kf_id", "n_obs", "max_radii2d",
                 "grad_accum", "denom"):
        arrays[name] = np.asarray(getattr(m, name))
    for k, v in (extra or {}).items():
        arrays[f"extra.{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str) -> tuple[GaussianMap, dict]:
    with np.load(path) as z:
        cap = z["params.xyz"].shape[0]
        sh_k = z["params.sh"].shape[1]
        m = new_map(cap, sh_degree=int(np.sqrt(sh_k)) - 1)
        params = ParamLeaves(
            *(jnp.asarray(z[f"params.{n}"]) for n in _LEAF_FIELDS)
        )
        adam_m = ParamLeaves(
            *(jnp.asarray(z[f"adam_m.{n}"]) for n in _LEAF_FIELDS)
        )
        adam_v = ParamLeaves(
            *(jnp.asarray(z[f"adam_v.{n}"]) for n in _LEAF_FIELDS)
        )
        m = m._replace(
            params=params, adam_m=adam_m, adam_v=adam_v,
            adam_t=jnp.asarray(z["adam_t"]),
            active=jnp.asarray(z["active"]),
            kf_id=jnp.asarray(z["kf_id"]),
            n_obs=jnp.asarray(z["n_obs"]),
            max_radii2d=jnp.asarray(z["max_radii2d"]),
            grad_accum=jnp.asarray(z["grad_accum"]),
            denom=jnp.asarray(z["denom"]),
        )
        extra = {
            k[len("extra."):]: z[k] for k in z.files if k.startswith("extra.")
        }
    return m, extra
