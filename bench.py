"""Benchmark: rays/s on the flagship Kerr-Schild render (the reference's
example2 workload, /root/reference/src/RayTraceGR.jl:578-612), timed post-JIT
like the reference's time.sh (second run counts).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

`vs_baseline` is rays/s relative to the measured Julia multi-threaded
reference throughput recorded in BASELINE.md (when measured); until then it
is reported against the BASELINE.json target proxy.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

# Measured on this machine's CPU (see BASELINE.md "To be measured"): the
# Julia reference example2 (40k rays, multithreaded, post-JIT). Until the
# Julia runtime is available to measure, use the conservative estimate from
# BASELINE.md; update when measured.
JULIA_REF_RAYS_PER_S = 20_000.0


def bench(ni=200, nj=200, dtype=jnp.float32, repeats=3, backend="xla_cm"):
    from raytracegr_jl_tpu.utils.setup import enable_compilation_cache
    enable_compilation_cache()
    from raytracegr_jl_tpu import IntegratorConfig, RenderConfig, render_fn
    from raytracegr_jl_tpu.models.scenes import build, example2_spec
    from raytracegr_jl_tpu.render import default_tol

    spec = example2_spec(ni, nj)
    metric, scene, canvas = build(spec, dtype)
    tol = default_tol(dtype)
    cfg = RenderConfig(
        integrator=IntegratorConfig(method="tsit5", rtol=tol, atol=tol,
                                    max_steps=20_000),
        backend=backend)
    fn = jax.jit(render_fn(metric, scene, cfg))

    # warm-up / compile (excluded, like time.sh's first @time run)
    rgb = jax.block_until_ready(fn(canvas.pos, canvas.normal))

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        rgb = jax.block_until_ready(fn(canvas.pos, canvas.normal))
        times.append(time.perf_counter() - t0)
    best = min(times)
    n_rays = ni * nj

    # MFU accounting (benchmarks/mfu.py): XLA-counted FLOPs for one Tsit5
    # iteration x measured accepted steps / wall time, against the chip's
    # bf16 peak (standard MFU) and the derived VPU f32 roofline (the one
    # that binds this zero-matmul workload).
    mfu = {}
    try:
        import os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from benchmarks.mfu import mfu_report
        from raytracegr_jl_tpu.ops.pallas_geodesic import scene_event_cm
        from raytracegr_jl_tpu.render import trace_batch, _metric_cm_of

        trace = jax.jit(lambda pos, normal: trace_batch(
            metric, scene, jnp.concatenate([pos, normal], -1).reshape(-1, 8),
            cfg))
        res = jax.block_until_ready(trace(canvas.pos, canvas.normal))
        mfu = mfu_report(_metric_cm_of(metric), scene_event_cm(scene), res,
                         best, jnp.float32)
    except Exception as e:  # MFU is diagnostic — never fail the bench
        print(f"mfu accounting unavailable: {e!r}"[:200], file=sys.stderr)
    return n_rays / best, best, rgb, mfu


def main():
    ni = nj = 200
    if len(sys.argv) > 1:
        ni = nj = int(sys.argv[1])
    backends = [sys.argv[2]] if len(sys.argv) > 2 else ["pallas", "xla_cm",
                                                        "xla"]
    rays_per_s, mfu = None, {}
    for be in backends:
        try:
            rays_per_s, secs, _, mfu = bench(ni, nj, backend=be)
            break
        except Exception as e:
            print(f"backend {be} failed: {e!r}"[:200], file=sys.stderr)
    if rays_per_s is None:
        raise SystemExit("all backends failed")
    print(json.dumps({
        "metric": "kerr_schild_render_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / JULIA_REF_RAYS_PER_S, 3),
        **mfu,
    }))


if __name__ == "__main__":
    main()
