"""Camera intrinsics + projection helpers.

The reference routes projection through OpenGL-style matrices
(getProjectionMatrix2, /root/reference/gaussian_splatting/utils/
graphics_utils.py:56-77) and the CUDA rasterizer's ndc2Pix. Composing those
reduces to the plain pinhole mapping u = fx*x/z + cx - 0.5 (and likewise for
v), which is what we use directly — no 4x4 projection matrices on the TPU
path. Intrinsics are a hashable NamedTuple of Python scalars so they can be
jit-static.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    @property
    def fovx(self) -> float:
        return 2.0 * math.atan(self.width / (2.0 * self.fx))

    @property
    def fovy(self) -> float:
        return 2.0 * math.atan(self.height / (2.0 * self.fy))

    @property
    def tan_fovx(self) -> float:
        return self.width / (2.0 * self.fx)

    @property
    def tan_fovy(self) -> float:
        return self.height / (2.0 * self.fy)


def focal2fov(focal: float, pixels: int) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def project_points(p_view, intr: Intrinsics):
    """Camera-space points -> pixel coordinates (u, v) with the CUDA
    ndc2Pix half-pixel convention (u = fx*x/z + cx - 0.5)."""
    z = jnp.maximum(p_view[..., 2], 1e-6)
    u = intr.fx * p_view[..., 0] / z + intr.cx - 0.5
    v = intr.fy * p_view[..., 1] / z + intr.cy - 0.5
    return u, v


def backproject_pixels(depth, intr: Intrinsics):
    """Dense unprojection of a [H, W] depth map to camera-space points.

    TPU-native replacement for the Open3D RGBD unprojection used at keyframe
    insertion (gaussian_model.py:144-166). Pixel (ix, iy) maps back with the
    same half-pixel convention used by projection... Open3D uses
    (ix - cx)/fx * z; we match Open3D here since that is what the reference's
    insertion used, and insertion only seeds approximate Gaussian centers.
    Returns [H, W, 3].
    """
    h, w = depth.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xs, ys)
    x = (xg - intr.cx) / intr.fx * depth
    y = (yg - intr.cy) / intr.fy * depth
    return jnp.stack([x, y, depth], axis=-1)
