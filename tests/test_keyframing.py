"""Unit tests of the keyframe policy math (slam/keyframing.py), a faithful
port of FrontEnd.is_keyframe / add_to_window
(/root/reference/utils/slam_frontend.py:1692-1783). Pure host numpy — these
pin the policy semantics independently of the e2e runs."""

import numpy as np

from monogs_tpu.slam.keyframing import (
    add_to_window,
    is_keyframe,
    keyframe_depth_init,
    overlap_ratio,
)


def pose(t):
    T = np.eye(4)
    T[:3, 3] = t
    return T


def test_is_keyframe_translation_trigger():
    """dist > kf_translation * median_depth forces a keyframe regardless of
    overlap (the `or dist_check` branch)."""
    vis = np.ones(100, bool)
    assert is_keyframe(
        pose([0.5, 0, 0]), pose([0, 0, 0]), median_depth=2.0,
        cur_visibility=vis, last_kf_visibility=vis,
        kf_translation=0.08, kf_min_translation=0.04, kf_overlap=0.9,
    )
    # tiny motion, full overlap: no keyframe
    assert not is_keyframe(
        pose([0.01, 0, 0]), pose([0, 0, 0]), median_depth=2.0,
        cur_visibility=vis, last_kf_visibility=vis,
        kf_translation=0.08, kf_min_translation=0.04, kf_overlap=0.9,
    )


def test_is_keyframe_overlap_trigger_needs_min_translation():
    """Low covisibility triggers a keyframe only above kf_min_translation
    (the `point_ratio < kf_overlap and dist_check2` branch)."""
    cur = np.zeros(100, bool)
    cur[:30] = True
    last = np.zeros(100, bool)
    last[25:60] = True  # IoU = 5/60 << kf_overlap
    common = dict(
        median_depth=2.0, cur_visibility=cur, last_kf_visibility=last,
        kf_translation=0.5, kf_min_translation=0.04, kf_overlap=0.9,
    )
    assert is_keyframe(pose([0.2, 0, 0]), pose([0, 0, 0]), **common)
    assert not is_keyframe(pose([0.01, 0, 0]), pose([0, 0, 0]), **common)


def test_overlap_ratio_is_iou():
    a = np.array([1, 1, 0, 0], bool)
    b = np.array([1, 0, 1, 0], bool)
    assert overlap_ratio(a, b) == 1 / 3
    assert overlap_ratio(np.zeros(4, bool), np.zeros(4, bool)) == 0.0


def test_add_to_window_evicts_low_overlap():
    """A window keyframe whose Szymkiewicz-Simpson overlap with the current
    frame falls at/below the cutoff is evicted (the LAST such one, :1752)."""
    n = 100
    cur = np.zeros(n, bool)
    cur[:50] = True
    high = np.zeros(n, bool)
    high[:45] = True            # overlap 45/45 = 1.0
    low = np.zeros(n, bool)
    low[60:] = True             # overlap 0
    occ = {10: high, 7: low, 3: low}
    poses = {i: pose([0.01 * i, 0, 0]) for i in [15, 10, 7, 3]}
    win, removed = add_to_window(
        15, cur, occ, [10, 7, 3], poses, window_size=8, kf_cutoff=0.3,
        initialized=True,
    )
    # slots 0-1 ([15, 10]) are never touched; of the two low-overlap frames
    # the LAST one (3) is removed
    assert removed == 3
    assert win == [15, 10, 7]


def test_add_to_window_inverse_distance_eviction():
    """When the window overflows, the frame with the largest
    sqrt(d_to_current) * sum(1/d_to_others) score is evicted (:1764-1783)."""
    n = 10
    vis = np.ones(n, bool)
    window = [4, 3, 2, 1]
    occ = {i: vis for i in window}
    # frame 1 sits far from the current frame AND near frame 2 -> largest
    # k * sum(1/d) score among the evictable slots
    poses = {
        5: pose([0.0, 0, 0]),
        4: pose([0.1, 0, 0]),
        3: pose([1.0, 0, 0]),
        2: pose([2.0, 0, 0]),
        1: pose([2.001, 0, 0]),
    }
    win, removed = add_to_window(
        5, vis, occ, window, poses, window_size=4, kf_cutoff=0.0,
        initialized=True,
    )
    assert removed in (1, 2)    # the near-duplicate far pair
    assert len(win) == 4
    assert win[0] == 5 and win[1] == 4  # N_dont_touch slots preserved


def test_add_to_window_uninitialized_cutoff():
    """Before initialization the cutoff is fixed at 0.4 (reset detection:
    a removed frame while uninitialized triggers the mono map reset)."""
    n = 100
    cur = np.zeros(n, bool)
    cur[:50] = True
    # overlap 12 common of min(50, 35) nnz -> ratio 0.343: between the
    # initialized cutoff (0.0 here) and the fixed uninitialized 0.4
    weak = np.zeros(n, bool)
    weak[38:73] = True          # intersection with cur = 12, min nnz = 35
    strong = cur.copy()
    # slots 0-1 of [11, 9, 8] are protected; the weak frame must sit at
    # slot >= 2 to be evictable
    occ = {9: strong, 8: weak}
    poses = {i: pose([0.01 * i, 0, 0]) for i in [11, 9, 8]}
    win, removed = add_to_window(
        11, cur, occ, [9, 8], poses, window_size=8, kf_cutoff=0.0,
        initialized=False,
    )
    # under initialized=True with kf_cutoff=0 this frame would survive
    # (0.343 > 0); the uninitialized 0.4 cutoff evicts it
    assert removed == 8
    win2, removed2 = add_to_window(
        11, cur, occ, [9, 8], poses, window_size=8, kf_cutoff=0.0,
        initialized=True,
    )
    assert removed2 is None and 8 in win2


def test_keyframe_depth_init_band_and_mask():
    rng = np.random.default_rng(0)
    h, w = 16, 16
    depth = np.full((h, w), 2.0, np.float32)
    depth[0, 0] = 50.0          # far outlier
    opacity = np.ones((h, w), np.float32)
    valid_rgb = np.ones((h, w), bool)
    valid_rgb[-1, :] = False
    out = keyframe_depth_init(depth, opacity, valid_rgb, rng)
    assert out.shape == (h, w)
    assert np.all(out[-1, :] == 0)          # invalid rgb zeroed
    # the outlier is clamped toward the median band (median 2, small std)
    assert abs(out[0, 0] - 2.0) < 25.0 and out[0, 0] != 50.0
    assert np.all(np.isfinite(out))
