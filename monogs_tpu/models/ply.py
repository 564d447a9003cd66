"""PLY import/export of the Gaussian map.

Binary little-endian PLY with the standard 3DGS attribute layout
(x y z nx ny nz f_dc_* f_rest_* opacity scale_* rot_*), matching the
reference's save_ply/load_ply (/root/reference/gaussian_splatting/scene/
gaussian_model.py:314-468) so maps interchange with other 3DGS tooling.
Implemented with numpy structured arrays — no plyfile dependency.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from .gaussian_map import GaussianMap, ParamLeaves, new_map


def _attribute_names(sh_k: int):
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(3 * (sh_k - 1))]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(3)]
    names += [f"rot_{i}" for i in range(4)]
    return names


def save_ply(m: GaussianMap, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    active = np.asarray(m.active)
    xyz = np.asarray(m.params.xyz)[active]
    sh = np.asarray(m.params.sh)[active]          # [n, K, 3]
    n = xyz.shape[0]
    sh_k = sh.shape[1]
    normals = np.zeros_like(xyz)
    # reference stores features transposed: f_dc is [3], f_rest flattened
    # channel-major ([3, K-1] -> flatten)
    f_dc = sh[:, 0, :]                            # [n, 3]
    f_rest = sh[:, 1:, :].transpose(0, 2, 1).reshape(n, -1)
    opacity = np.asarray(m.params.opa_logit)[active]
    scale = np.asarray(m.params.log_scale)[active]
    rot = np.asarray(m.params.quat)[active]

    names = _attribute_names(sh_k)
    dtype = [(name, "<f4") for name in names]
    data = np.concatenate(
        [xyz, normals, f_dc, f_rest, opacity, scale, rot], axis=1
    ).astype("<f4")
    rec = np.empty(n, dtype=dtype)
    for i, name in enumerate(names):
        rec[name] = data[:, i]

    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {name}\n" for name in names)
        + "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        rec.tofile(f)


def load_ply(path: str, capacity: int | None = None) -> GaussianMap:
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode("ascii").splitlines()
        n = 0
        names = []
        for line in lines:
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property float"):
                names.append(line.split()[-1])
        rec = np.fromfile(f, dtype=[(name, "<f4") for name in names], count=n)

    n_rest = sum(1 for name in names if name.startswith("f_rest_"))
    sh_k = 1 + n_rest // 3
    if capacity is None:
        capacity = max(1 << int(np.ceil(np.log2(max(n, 1) / 0.75))), 1024)
    m = new_map(capacity, sh_degree=int(np.sqrt(sh_k)) - 1)

    xyz = np.stack([rec["x"], rec["y"], rec["z"]], axis=1)
    f_dc = np.stack([rec[f"f_dc_{i}"] for i in range(3)], axis=1)
    sh = np.zeros((n, sh_k, 3), np.float32)
    sh[:, 0, :] = f_dc
    if n_rest:
        rest = np.stack(
            [rec[f"f_rest_{i}"] for i in range(n_rest)], axis=1
        ).reshape(n, 3, sh_k - 1)
        sh[:, 1:, :] = rest.transpose(0, 2, 1)
    opacity = rec["opacity"][:, None]
    scale = np.stack([rec[f"scale_{i}"] for i in range(3)], axis=1)
    rot = np.stack([rec[f"rot_{i}"] for i in range(4)], axis=1)

    pad = capacity - n

    def padded(x, fill=0.0):
        return jnp.asarray(
            np.concatenate([x, np.full((pad,) + x.shape[1:], fill, x.dtype)])
        )

    params = ParamLeaves(
        xyz=padded(xyz),
        sh=padded(sh),
        log_scale=padded(scale, -10.0),
        quat=padded(rot),
        opa_logit=padded(opacity, -10.0),
    )
    active = jnp.asarray(np.arange(capacity) < n)
    return m._replace(
        params=params,
        active=active,
        kf_id=jnp.where(active, 0, -1).astype(jnp.int32),
    )
