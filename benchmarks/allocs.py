"""Memory accounting analog of the reference's allocs.sh
(/root/reference/allocs.sh:3-9, --track-allocation): reports device memory
statistics and the compiled executable's footprint for the flagship render.

Usage: python benchmarks/allocs.py [N] [--cpu]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=100)
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
    compiled = jax.jit(render_fn(metric, scene, cfg)).lower(
        canvas.pos, canvas.normal).compile()

    try:
        mem = compiled.memory_analysis()
        print("compiled memory analysis:")
        for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, attr, None)
            if v is not None:
                print(f"  {attr}: {v / 1e6:.3f} MB")
    except Exception as e:  # memory_analysis is backend-dependent
        print("memory_analysis unavailable:", e)

    jax.block_until_ready(compiled(canvas.pos, canvas.normal))
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            print(f"{d}: bytes_in_use={stats.get('bytes_in_use', 0)/1e6:.3f} MB "
                  f"peak={stats.get('peak_bytes_in_use', 0)/1e6:.3f} MB")


if __name__ == "__main__":
    main()
