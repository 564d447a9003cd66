"""Fixed-capacity Gaussian map state: the TPU-native GaussianModel.

The reference's GaussianModel (/root/reference/gaussian_splatting/scene/
gaussian_model.py) grows/shrinks torch tensors and performs "optimizer
surgery" on Adam state under insert/delete (:470-557). XLA wants static
shapes, so here the map is a fixed-capacity structure-of-arrays pytree with
an `active` mask; insertion, densify-clone/split and pruning are masked
scatters into free slots found by gather-only compaction, and the Adam
moments live alongside the parameters and are scattered by the same indices
(new slots get zeroed moments, exactly like cat_tensors_to_optimizer).

Slots are never moved once allocated, so per-Gaussian side state
(kf_id, n_obs, visibility bitsets held by the backend) stays index-aligned
across densification — no re-indexing dance as in prune_points (:507-523).

All mutation functions are pure (state in, state out) and jittable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import se3
from ..render.renderer import GaussianArrays
from ..render.tiling import compact_indices


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


class ParamLeaves(NamedTuple):
    """The optimizable leaves (one Adam group each, matching training_setup
    gaussian_model.py:252-285)."""

    xyz: jax.Array        # [N, 3]
    sh: jax.Array         # [N, K, 3]  (index 0 = f_dc, rest = f_rest)
    log_scale: jax.Array  # [N, 3]
    quat: jax.Array       # [N, 4]
    opa_logit: jax.Array  # [N, 1]


class GaussianMap(NamedTuple):
    params: ParamLeaves
    adam_m: ParamLeaves
    adam_v: ParamLeaves
    adam_t: jax.Array       # [] int32 global Adam step (shared, like torch)
    active: jax.Array       # [N] bool
    kf_id: jax.Array        # [N] int32 (unique_kfIDs, -1 = free slot)
    n_obs: jax.Array        # [N] int32
    max_radii2d: jax.Array  # [N] f32
    grad_accum: jax.Array   # [N] f32 (xyz_gradient_accum)
    denom: jax.Array        # [N] f32

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    @property
    def n_active(self):
        return jnp.sum(self.active)

    def render_view(self) -> GaussianArrays:
        return GaussianArrays(
            xyz=self.params.xyz,
            sh=self.params.sh,
            log_scale=self.params.log_scale,
            quat=self.params.quat,
            opa_logit=self.params.opa_logit,
            active=self.active,
        )


class MapHyper(NamedTuple):
    """Optimizer hyperparameters (opt_params + spatial scale), static."""

    position_lr_init: float = 0.0016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.001
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    spatial_lr_scale: float = 6.0   # gaussians.init_lr(6.0) (slam.py:60)
    adam_eps: float = 1e-15         # torch.optim.Adam(l, eps=1e-15)
    beta1: float = 0.9
    beta2: float = 0.999


def new_map(capacity: int, sh_degree: int = 0) -> GaussianMap:
    k = (sh_degree + 1) ** 2
    zeros = functools.partial(jnp.zeros, dtype=jnp.float32)
    params = ParamLeaves(
        xyz=zeros((capacity, 3)),
        sh=zeros((capacity, k, 3)),
        log_scale=jnp.full((capacity, 3), -10.0, jnp.float32),
        quat=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (capacity, 1)),
        opa_logit=jnp.full((capacity, 1), -10.0, jnp.float32),
    )
    zero_leaves = ParamLeaves(*(jnp.zeros_like(p) for p in params))
    return GaussianMap(
        params=params,
        adam_m=zero_leaves,
        adam_v=zero_leaves,
        adam_t=jnp.zeros((), jnp.int32),
        active=jnp.zeros((capacity,), bool),
        kf_id=jnp.full((capacity,), -1, jnp.int32),
        n_obs=jnp.zeros((capacity,), jnp.int32),
        max_radii2d=zeros((capacity,)),
        grad_accum=zeros((capacity,)),
        denom=zeros((capacity,)),
    )


def xyz_lr_at(h: MapHyper, step):
    """Log-linear position LR schedule (general_utils.py:80-95 `helper`)."""
    lr_init = h.position_lr_init * h.spatial_lr_scale
    lr_final = h.position_lr_final * h.spatial_lr_scale
    t = jnp.clip(step / h.position_lr_max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return log_lerp


def _leaf_lrs(h: MapHyper, xyz_lr, sh_k: int):
    """Per-leaf learning rates; the sh leaf carries a per-coefficient
    multiplier (dc at feature_lr, rest at feature_lr/20 — training_setup)."""
    sh_lr = jnp.full((sh_k,), h.feature_lr / 20.0).at[0].set(h.feature_lr)
    return ParamLeaves(
        xyz=xyz_lr,
        sh=sh_lr[None, :, None],
        log_scale=h.scaling_lr * h.spatial_lr_scale,
        quat=h.rotation_lr,
        opa_logit=h.opacity_lr,
    )


def adam_step(m: GaussianMap, grads: ParamLeaves, h: MapHyper, step) -> GaussianMap:
    """One Adam step over all active Gaussians with torch semantics
    (bias correction, eps outside sqrt of v_hat). `step` is the backend's
    iteration count used for the xyz LR schedule."""
    t = m.adam_t + 1
    b1, b2 = h.beta1, h.beta2
    bc1 = 1.0 - b1 ** t.astype(jnp.float32)
    bc2 = 1.0 - b2 ** t.astype(jnp.float32)
    lrs = _leaf_lrs(h, xyz_lr_at(h, step), m.params.sh.shape[1])
    mask = m.active

    def upd(p, g, mm, vv, lr):
        am = mask.reshape((-1,) + (1,) * (p.ndim - 1))
        g = jnp.where(am, g, 0.0)
        mm2 = b1 * mm + (1 - b1) * g
        vv2 = b2 * vv + (1 - b2) * g * g
        step_val = lr * (mm2 / bc1) / (jnp.sqrt(vv2 / bc2) + h.adam_eps)
        p2 = jnp.where(am, p - step_val, p)
        mm2 = jnp.where(am, mm2, mm)
        vv2 = jnp.where(am, vv2, vv)
        return p2, mm2, vv2

    out = [
        upd(p, g, mm, vv, lr)
        for p, g, mm, vv, lr in zip(m.params, grads, m.adam_m, m.adam_v, lrs)
    ]
    return m._replace(
        params=ParamLeaves(*(o[0] for o in out)),
        adam_m=ParamLeaves(*(o[1] for o in out)),
        adam_v=ParamLeaves(*(o[2] for o in out)),
        adam_t=t,
    )


def _scatter_leaves(params: ParamLeaves, slots, write_mask, new: ParamLeaves):
    """Scatter rows of `new` into `slots` where write_mask; slots beyond the
    capacity (== N sentinel) are dropped by indexing into a padded array."""

    def one(p, q):
        n = p.shape[0]
        pad = jnp.concatenate([p, jnp.zeros_like(p[:1])], axis=0)
        idx = jnp.where(write_mask, slots, n)
        return pad.at[idx].set(jnp.where(
            write_mask.reshape((-1,) + (1,) * (q.ndim - 1)), q, pad[idx]
        ))[:n]

    return ParamLeaves(*(one(p, q) for p, q in zip(params, new)))


def insert(m: GaussianMap, new: ParamLeaves, new_count, kf_id) -> GaussianMap:
    """Append up to len(new.xyz) Gaussians into free slots
    (extend_from_pcd: gaussian_model.py:210-245). `new_count` is the dynamic
    number of valid rows at the front of `new`. New slots get zeroed Adam
    moments (cat_tensors_to_optimizer zero-extension)."""
    cap_new = new.xyz.shape[0]
    slots, slot_ok, _ = compact_indices(~m.active, cap_new)
    row = jnp.arange(cap_new)
    write = slot_ok & (row < new_count)
    params = _scatter_leaves(m.params, slots, write, new)
    zero = ParamLeaves(*(jnp.zeros_like(p) for p in new))
    adam_m = _scatter_leaves(m.adam_m, slots, write, zero)
    adam_v = _scatter_leaves(m.adam_v, slots, write, zero)
    n = m.capacity
    idx = jnp.where(write, slots, n)

    def set1(arr, val):
        pad = jnp.concatenate([arr, jnp.zeros_like(arr[:1])])
        return pad.at[idx].set(jnp.where(write, val, pad[idx]))[:n]

    return m._replace(
        params=params,
        adam_m=adam_m,
        adam_v=adam_v,
        active=set1(m.active, True),
        kf_id=set1(m.kf_id, jnp.asarray(kf_id, jnp.int32)),
        n_obs=set1(m.n_obs, 0),
        max_radii2d=set1(m.max_radii2d, 0.0),
        grad_accum=set1(m.grad_accum, 0.0),
        denom=set1(m.denom, 0.0),
    )


def prune(m: GaussianMap, mask) -> GaussianMap:
    """Deactivate Gaussians where mask (prune_points, gaussian_model.py:507).
    Slots become free for reuse; no data movement needed."""
    return m._replace(active=m.active & ~mask, kf_id=jnp.where(mask, -1, m.kf_id))


def reset_opacity(m: GaussianMap, value: float = 0.01) -> GaussianMap:
    """Clamp opacity down and zero its Adam moments
    (reset_opacity + replace_tensor_to_optimizer, gaussian_model.py:364-367,
    470-483 — note the reference zeroes the whole opacity moment tensor)."""
    target = inverse_sigmoid(jnp.full_like(m.params.opa_logit, value))
    new_opa = jnp.where(m.active[:, None], target, m.params.opa_logit)
    return m._replace(
        params=m.params._replace(opa_logit=new_opa),
        adam_m=m.adam_m._replace(opa_logit=jnp.zeros_like(m.adam_m.opa_logit)),
        adam_v=m.adam_v._replace(opa_logit=jnp.zeros_like(m.adam_v.opa_logit)),
    )


def reset_opacity_nonvisible(m: GaussianMap, visible_any) -> GaussianMap:
    """Reset opacity to 0.4 for Gaussians not visible in any window view
    (reset_opacity_nonvisible, gaussian_model.py:369-377). Opacity Adam
    moments are zeroed for the whole tensor, as the reference does."""
    target = inverse_sigmoid(jnp.full_like(m.params.opa_logit, 0.4))
    keep = visible_any[:, None] | ~m.active[:, None]
    new_opa = jnp.where(keep, m.params.opa_logit, target)
    return m._replace(
        params=m.params._replace(opa_logit=new_opa),
        adam_m=m.adam_m._replace(opa_logit=jnp.zeros_like(m.adam_m.opa_logit)),
        adam_v=m.adam_v._replace(opa_logit=jnp.zeros_like(m.adam_v.opa_logit)),
    )


def densify_and_prune(
    m: GaussianMap,
    key,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size,
    h: MapHyper,
    clone_cap: int = 8192,
    split_cap: int = 4096,
) -> GaussianMap:
    """Clone small high-gradient Gaussians, split large ones (2-way with
    scale/1.6 and positional noise), prune transparent/oversized ones.
    Mirrors densify_and_prune/densify_and_clone/densify_and_split
    (gaussian_model.py:595-691) at fixed capacity:

      - children are compacted to static caps (clone_cap / split_cap) and
        scattered into free slots; overflow children are dropped,
      - split parents are pruned; clone parents stay,
      - all densification stats and max_radii2d reset to zero afterwards, as
        densification_postfix does for the full tensor,
      - the opacity/size prune applies to parents and children alike.
    """
    grads = m.grad_accum / jnp.maximum(m.denom, 1e-12)
    grads = jnp.where(m.denom > 0, grads, 0.0)
    scale = jnp.exp(m.params.log_scale)
    max_scale = jnp.max(scale, axis=-1)
    opa = jax.nn.sigmoid(m.params.opa_logit[:, 0])

    hot = m.active & (grads >= max_grad)
    clone_mask = hot & (max_scale <= h.percent_dense * extent)
    split_mask = hot & (max_scale > h.percent_dense * extent)

    prune_parent = m.active & (opa < min_opacity)
    if max_screen_size is not None:
        # NOTE: the reference's screen-size condition (max_radii2D >
        # max_screen_size) is provably dead there: densification_postfix
        # zeroes max_radii2D for the whole map during clone/split, BEFORE
        # densify_and_prune reads it (gaussian_model.py:586-589, 683-690).
        # Only the world-size condition is live; we match that behavior.
        prune_parent = prune_parent | (m.active & (max_scale > 0.1 * extent))
    keep = m.active & ~split_mask & ~prune_parent

    m2 = m._replace(active=keep, kf_id=jnp.where(keep, m.kf_id, -1))

    def gather_children(sel_idx, sel_ok):
        src = ParamLeaves(*(p[sel_idx] for p in m.params))
        return src, m.kf_id[sel_idx], m.n_obs[sel_idx], sel_ok

    # clones: verbatim copies
    c_idx, c_ok, _ = compact_indices(clone_mask, clone_cap)
    clone_p, clone_kf, clone_nobs, clone_ok = gather_children(c_idx, c_ok)

    # splits: 2 children per parent with sampled offsets, scale/(0.8*2)
    s_idx, s_ok, _ = compact_indices(split_mask, split_cap)
    sp, sp_kf, sp_nobs, _ = gather_children(s_idx, s_ok)
    stds = jnp.exp(sp.log_scale)  # [split_cap, 3]
    samples = jax.random.normal(key, (2, split_cap, 3)) * stds[None]
    rots = se3.quat_to_rotmat(sp.quat)  # [split_cap, 3, 3]
    offs = jnp.einsum("cij,kcj->kci", rots, samples)  # [2, split_cap, 3]
    new_log_scale = jnp.log(jnp.maximum(stds / (0.8 * 2.0), 1e-12))

    def split_child(i):
        return ParamLeaves(
            xyz=sp.xyz + offs[i],
            sh=sp.sh,
            log_scale=new_log_scale,
            quat=sp.quat,
            opa_logit=sp.opa_logit,
        )

    children = ParamLeaves(
        *(
            jnp.concatenate([a, b, c], axis=0)
            for a, b, c in zip(clone_p, split_child(0), split_child(1))
        )
    )
    child_kf = jnp.concatenate([clone_kf, sp_kf, sp_kf])
    child_nobs = jnp.concatenate([clone_nobs, sp_nobs, sp_nobs])
    child_ok = jnp.concatenate([clone_ok, s_ok, s_ok])

    # prune children by the same opacity/size rules
    child_opa = jax.nn.sigmoid(children.opa_logit[:, 0])
    child_maxs = jnp.max(jnp.exp(children.log_scale), axis=-1)
    child_prune = child_opa < min_opacity
    if max_screen_size is not None:
        child_prune = child_prune | (child_maxs > 0.1 * extent)
    child_ok = child_ok & ~child_prune

    # scatter children into free slots
    n_child_cap = child_ok.shape[0]
    # compact children to the front so they fill slots contiguously
    ci, ci_ok, n_children = compact_indices(child_ok, n_child_cap)
    children = ParamLeaves(*(p[ci] for p in children))
    child_kf = child_kf[ci]
    child_nobs = child_nobs[ci]

    slots, slot_ok, _ = compact_indices(~m2.active, n_child_cap)
    write = slot_ok & ci_ok & (jnp.arange(n_child_cap) < n_children)

    params = _scatter_leaves(m2.params, slots, write, children)
    zero = ParamLeaves(*(jnp.zeros_like(p) for p in children))
    adam_m = _scatter_leaves(m2.adam_m, slots, write, zero)
    adam_v = _scatter_leaves(m2.adam_v, slots, write, zero)

    n = m.capacity
    idx = jnp.where(write, slots, n)

    def set1(arr, val):
        pad = jnp.concatenate([arr, jnp.zeros_like(arr[:1])])
        return pad.at[idx].set(jnp.where(write, val, pad[idx]))[:n]

    return m2._replace(
        params=params,
        adam_m=adam_m,
        adam_v=adam_v,
        active=set1(m2.active, True),
        kf_id=set1(m2.kf_id, child_kf),
        n_obs=set1(m2.n_obs, child_nobs),
        # densification_postfix resets stats for the whole map
        max_radii2d=jnp.zeros_like(m.max_radii2d),
        grad_accum=jnp.zeros_like(m.grad_accum),
        denom=jnp.zeros_like(m.denom),
    )
