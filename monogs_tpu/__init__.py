"""monogs_tpu — a TPU-native Gaussian-splatting SLAM framework.

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of MonoGS
("Gaussian Splatting SLAM", CVPR 2024; reference: rogerhh/MonoGS fork with a
count-sketched second-order camera tracker). The entire map is a fixed-capacity
structure-of-arrays pytree of 3D Gaussians living in HBM; tracking and mapping
are pure jitted functions; the differentiable tile rasterizer yields analytic
gradients w.r.t. both Gaussian parameters and the SE(3) camera pose through
JAX autodiff instead of hand-written CUDA backward kernels.

Package layout:
  ops/      core math: SE(3), spherical harmonics, image filters, losses,
            kNN, count-sketching
  render/   the differentiable renderer (golden reference + tiled TPU path)
  models/   Gaussian map state + insertion/densify/prune at fixed capacity
  slam/     tracking/mapping optimizers, frontend/backend runtime, config
  data/     dataset parsers (TUM / Replica / EuRoC / Realsense) + synthetic
  eval/     ATE (Umeyama/evo-equivalent), PSNR/SSIM/LPIPS
  parallel/ multi-chip sharding (mesh layouts, view/gaussian sharding)
  utils/    logging, profiling
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache: repeated runs skip the 30-70s
    first-frame compiles of the tracking/mapping programs."""
    import os

    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "monogs_tpu", "xla"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache EVERYTHING, including sub-second programs: a SLAM warmup
    # compiles ~600 programs of which ~330 are tiny op-by-op dispatches
    # (broadcast_in_dim/dynamic_slice/...); at the default 1.0s threshold
    # none of them persist, so every warm restart re-pays their compiles
    # (18% hit rate measured, docs/bench_r5_0821_a.log). With 0.0 the
    # warm-path hit rate covers the long tail too.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
