"""Wall-clock timing of the flagship render, mirroring the reference's
time.sh semantics (/root/reference/time.sh:3-7): run twice, the second
(post-JIT) run is the number.

Usage: python benchmarks/time.py [N] [--backend xla|pallas] [--cpu]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=200)
    ap.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--example", type=int, default=2, choices=[1, 2])
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from raytracegr_jl_tpu import IntegratorConfig, RenderConfig, render_fn
    from raytracegr_jl_tpu.models.scenes import (build, example1_spec,
                                                 example2_spec)
    from raytracegr_jl_tpu.render import default_tol

    dtype = jnp.float32
    spec_fn = example1_spec if args.example == 1 else example2_spec
    spec = spec_fn(args.n, args.n)
    metric, scene, canvas = build(spec, dtype)
    tol = default_tol(dtype)
    cfg = RenderConfig(
        integrator=IntegratorConfig(method="tsit5", rtol=tol, atol=tol,
                                    max_steps=20_000),
        backend=args.backend)
    fn = jax.jit(render_fn(metric, scene, cfg))

    for run in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(canvas.pos, canvas.normal))
        dt = time.perf_counter() - t0
        label = "with-compile" if run == 0 else "post-JIT"
        print(f"run {run + 1} ({label}): {dt:.3f}s "
              f"= {args.n * args.n / dt:,.0f} rays/s")

    # Structured per-render observability (utils/stats.py) — hit/killed
    # classification + the step-count distribution that governs divergence
    # cost on TPU tiles.
    import json

    from raytracegr_jl_tpu.render import trace_batch
    from raytracegr_jl_tpu.utils.stats import trace_stats

    y0 = jnp.concatenate([canvas.pos, canvas.normal], -1).reshape(-1, 8)
    t0 = time.perf_counter()
    res = jax.block_until_ready(
        jax.jit(lambda y: trace_batch(metric, scene, y, cfg))(y0))
    print(json.dumps(trace_stats(res, wall_s=time.perf_counter() - t0,
                                 cfg=cfg.integrator)))


if __name__ == "__main__":
    main()
