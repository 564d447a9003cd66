"""Frame / keyframe containers.

The reference's Camera (utils/camera_utils.py:10-162) is an nn.Module mixing
host metadata, learnable parameters and cached masks. Here the device-side
tensors live in a FrameData pytree (static shapes, jit-friendly) and the
host-side bookkeeping (uid, pose estimate, exposure scalars, gt pose) in a
plain Frame object owned by the frontend.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.image import compute_grad_mask


class FrameData(NamedTuple):
    """Device-resident per-frame tensors (all [.., H, W] float32)."""

    gt_image: jax.Array      # [3, H, W]
    gt_depth: jax.Array      # [1, H, W] (zeros when no depth)
    has_depth: jax.Array     # [] bool
    track_mask: jax.Array    # [1, H, W] boundary * edge mask (scalar losses)
    mapping_mask: jax.Array  # [1, H, W] boundary mask (mapping + per-pixel)


def make_frame_data(gt_image, gt_depth, edge_threshold, rgb_boundary_threshold,
                    dataset_type: str) -> FrameData:
    track_mask, mapping_mask = compute_grad_mask(
        gt_image, edge_threshold, rgb_boundary_threshold, dataset_type
    )
    if gt_depth is None:
        depth = jnp.zeros((1,) + gt_image.shape[1:], jnp.float32)
        has = jnp.asarray(False)
    else:
        depth = jnp.asarray(gt_depth, jnp.float32).reshape(
            (1,) + gt_image.shape[1:]
        )
        has = jnp.asarray(True)
    return FrameData(
        gt_image=jnp.asarray(gt_image, jnp.float32),
        gt_depth=depth,
        has_depth=has,
        track_mask=track_mask,
        mapping_mask=mapping_mask,
    )


@dataclass
class Frame:
    """Host-side frame state (pose estimate, exposure, metadata)."""

    uid: int
    T: jax.Array                      # [4,4] world->camera estimate
    T_gt: jax.Array                   # [4,4] ground truth (for eval)
    data: Optional[FrameData] = None  # freed by clean() for non-keyframes
    exposure_a: jax.Array = field(default_factory=lambda: jnp.float32(1.0))
    exposure_b: jax.Array = field(default_factory=lambda: jnp.float32(0.0))
    depth_np: object = None           # host numpy depth (keyframe insertion)

    def clean(self):
        """Free per-frame tensors (camera_utils.py:149-162)."""
        self.data = None
        self.depth_np = None
