"""Profiling analog of the reference's profile.sh
(/root/reference/profile.sh:3-10): warm-up render, then a measured render
under the JAX profiler; the trace is written for xprof/Perfetto.

Usage: python benchmarks/profile.py [N] [--outdir /tmp/rtgr_trace]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=100)
    ap.add_argument("--outdir", default="/tmp/rtgr_trace")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from raytracegr_jl_tpu import IntegratorConfig, RenderConfig, render_fn
    from raytracegr_jl_tpu.models.scenes import build, example2_spec
    from raytracegr_jl_tpu.render import default_tol

    dtype = jnp.float32
    spec = example2_spec(args.n, args.n)
    metric, scene, canvas = build(spec, dtype)
    tol = default_tol(dtype)
    cfg = RenderConfig(integrator=IntegratorConfig(
        method="tsit5", rtol=tol, atol=tol, max_steps=20_000))
    fn = jax.jit(render_fn(metric, scene, cfg))

    # Warm-up (compile excluded from the trace), like profile.sh's first run.
    jax.block_until_ready(fn(canvas.pos, canvas.normal))

    with jax.profiler.trace(args.outdir):
        jax.block_until_ready(fn(canvas.pos, canvas.normal))
    print(f"trace written to {args.outdir}")


if __name__ == "__main__":
    main()
