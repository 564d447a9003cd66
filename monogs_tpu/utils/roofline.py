"""FLOPs / bytes / MFU accounting for the hot programs (VERDICT r4 #4).

The judging bar for single-chip performance is MFU, and a latency-bound
SLAM loop needs its programs CLASSIFIED (compute- vs bandwidth- vs
latency-bound) before optimizing them — `jax.stages.Compiled.cost_analysis()`
gives XLA's own flop/byte counts for a compiled program, and dividing by a
measured steady-state wall time yields achieved TFLOP/s and arithmetic
intensity.

Caveats (stated here once, applied everywhere):
  - `lax.while_loop`/`fori_loop` bodies are counted ONCE by HLO cost
    analysis (trip counts are dynamic), so whole-frame programs with
    iteration loops under-report. Per-iteration programs (one fused kernel
    pass + its pullback) are loop-free and exact — prefer those, then
    multiply by measured iteration counts.
  - Pallas kernels are custom calls: XLA reports 0 flops for the kernel
    body itself. `pallas_flops_*` below supply analytic per-kernel counts
    derived from the kernel source (render/pallas_lists.py) so the fused
    paths are not invisible to the accounting.

v5e single-chip peaks (public: cloud.google.com/tpu/docs/v5e): 197 TFLOP/s
bf16, 394 TOPS int8, 819 GB/s HBM. The blend kernels run f32 (HIGHEST
precision pinned where exactness matters — CLAUDE.md); f32 MXU throughput
on v5e is ~1/4 the bf16 number, so MFU is reported against BOTH: `mfu_bf16`
(the honest hardware-peak denominator) and `mfu_f32` (peak/4, the
achievable ceiling for this precision choice).
"""

from __future__ import annotations

V5E_PEAK_BF16 = 1.97e14   # FLOP/s
V5E_PEAK_F32 = V5E_PEAK_BF16 / 4.0
V5E_HBM_BW = 8.19e11      # bytes/s


def compiled_cost(jitted, *args, **kwargs):
    """(flops, bytes_accessed) from XLA's cost analysis of jitted(*args).

    Returns (None, None) if the backend does not expose cost analysis
    (older PJRT plugins). `jitted` must be a jax.jit-wrapped callable.
    """
    try:
        compiled = jitted.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax: one dict per device
            ca = ca[0]
        if not isinstance(ca, dict):
            return None, None
        return ca.get("flops"), ca.get("bytes accessed")
    except Exception:
        return None, None


def classify(flops, bytes_accessed, time_s,
             peak_flops=V5E_PEAK_F32, peak_bw=V5E_HBM_BW):
    """Roofline classification of a measured program execution.

    Returns a dict with achieved tflops/bandwidth, arithmetic intensity,
    MFU against both f32 and bf16 peaks, and a bound verdict:
      - 'compute' if achieved flops > 30% of the precision peak,
      - 'bandwidth' if achieved bytes/s > 25% of HBM peak (the sustained
        fraction a gather/scatter-heavy access pattern can realistically
        hold — the r5 mapping iteration measured 29.7% while being
        k_fine/row-linear, i.e. clearly traffic-limited),
      - 'latency' if neither (the program is waiting, not working).
    """
    out = {"time_s": time_s}
    if flops is not None and time_s and time_s > 0:
        ach = flops / time_s
        out["flops"] = flops
        out["tflops_achieved"] = ach / 1e12
        out["mfu_f32"] = ach / V5E_PEAK_F32
        out["mfu_bf16"] = ach / V5E_PEAK_BF16
    if bytes_accessed is not None and time_s and time_s > 0:
        bw = bytes_accessed / time_s
        out["bytes"] = bytes_accessed
        out["gbps_achieved"] = bw / 1e9
        out["hbm_util"] = bw / peak_bw
    if flops and bytes_accessed:
        out["arith_intensity"] = flops / bytes_accessed
    cb = out.get("mfu_f32", 0.0) > 0.30
    bb = out.get("hbm_util", 0.0) > 0.25
    out["bound"] = "compute" if cb else ("bandwidth" if bb else "latency")
    return out


def pallas_flops_blend_fwd(n_tiles, kf, p=256):
    """Analytic FLOPs of one forward blend pass over the lists
    (_forward_chunks + _outs_from, render/pallas_lists.py): per (row,
    pixel): conic quadratic form + exp + alpha/transmittance chain
    (~20 flop) plus the [Kf x Kf] prefix-sum matmul and the [Kf x P]
    feature blends on the MXU (~2*Kf flop/px for the scan + 8 feature
    columns)."""
    per_rowpx = 20 + 2 * 8
    scan = 2 * kf * kf * p / max(kf, 1)  # amortized prefix matmul per tile
    return n_tiles * (kf * p * per_rowpx + scan)


def pallas_flops_map_grad(n_tiles, kf, p=256):
    """Fused mapping loss+grad kernel (_map_grad_kernel): forward blend +
    residual chain + reverse blend; the reverse pass re-walks every (row,
    pixel) with ~2x the forward arithmetic (measured ~3x primal for the
    full VJP pair — CLAUDE.md)."""
    return 3 * pallas_flops_blend_fwd(n_tiles, kf, p)


def pallas_flops_fo_grad(n_tiles, kf, p=256):
    """Fused tracking fo kernel (_fo_grad_kernel): same structure as the
    mapping grad kernel (fwd + residual + reverse)."""
    return 3 * pallas_flops_blend_fwd(n_tiles, kf, p)


def pallas_flops_jvp8(n_tiles, kf, p=256, n_tan=6):
    """6-tangent JVP kernel (_jvp8_kernel): primal + n_tan tangent chains,
    each tangent ~primal's elementwise cost (measured ~7x primal for 6
    tangents — CLAUDE.md)."""
    return (1 + n_tan) * pallas_flops_blend_fwd(n_tiles, kf, p)


def fmt(tag, c):
    parts = [tag]
    if "flops" in c:
        parts.append(f"{c['flops']/1e9:.2f} GFLOP")
        parts.append(f"{c['tflops_achieved']:.3f} TFLOP/s")
        parts.append(f"mfu f32 {100*c['mfu_f32']:.2f}% / "
                     f"bf16 {100*c['mfu_bf16']:.2f}%")
    if "gbps_achieved" in c:
        parts.append(f"{c['gbps_achieved']:.1f} GB/s "
                     f"({100*c['hbm_util']:.1f}% HBM)")
    if "arith_intensity" in c:
        parts.append(f"AI {c['arith_intensity']:.1f}")
    parts.append(c["bound"] + "-bound")
    return "  ".join(parts)
