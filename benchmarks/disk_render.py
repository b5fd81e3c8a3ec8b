"""Accretion-disk + gravitational-redshift render (BASELINE.json config 4).

Renders ``accretion_disk_spec`` — a Keplerian annulus around a spinning Kerr
black hole, shaded by the g-factor (models/shading.py; the reference's
dangling metric-shading hook at /root/reference/src/RayTraceGR.jl:416) — at
1k x 1k by default, timed post-JIT like the reference's time.sh
(/root/reference/time.sh:3-7), and saves the image to scenes/.

Usage:  python benchmarks/disk_render.py [N] [backend] [a]
        N        image side (default 1024)
        backend  xla | xla_cm | pallas | pallas_compact | pallas_compact_fast
                 (default: pallas_compact_fast with fallbacks)
        a        spin (default 0.8)

``pallas_compact`` routes through compaction.render_compacted: chunked
kernel launches that pack still-active rays into dense tiles between
chunks — the photon-ring band (p99 ~15k steps vs p50 ~21) then runs on a
small packed batch instead of stalling mostly-dead full-size tiles.
Bitwise identical image (tests/test_compaction.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_disk(n=1024, backend="pallas", a=0.8, dtype=jnp.float32):
    from raytracegr_jl_tpu import IntegratorConfig, RenderConfig, render_fn
    from raytracegr_jl_tpu.models.scenes import accretion_disk_spec, build
    from raytracegr_jl_tpu.render import default_tol
    from raytracegr_jl_tpu.utils.setup import enable_compilation_cache

    enable_compilation_cache()
    spec = accretion_disk_spec(ni=n, nj=n, a=a)
    metric, scene, canvas = build(spec, dtype)
    tol = default_tol(dtype)
    cfg = RenderConfig(
        integrator=IntegratorConfig(method="tsit5", rtol=tol, atol=tol,
                                    max_steps=20_000, stop_rho=1.0,
                                    sort_rays=True),
        backend=backend, shading="redshift")
    if backend.startswith("pallas_compact"):
        from raytracegr_jl_tpu.compaction import make_compact_renderer

        # "pallas_compact_fast" jits the init-dt + shading epilogue
        # (compaction.make_compact_renderer docstring): same trajectories
        # up to ulp-level dt0 rounding, no bitwise pin, ~25% faster
        # end-to-end at 1024x1024.
        render = make_compact_renderer(
            metric, scene, cfg, fast_epilogue=backend.endswith("_fast"))
        # compile every bucket launcher (excluded, ~time.sh) — and BLOCK:
        # an un-synced warm-up let compilation bleed into the timed run
        # (round-5: first timed call read 6.6 s vs the 1.4 s steady state).
        jax.block_until_ready(render(canvas).rgb)
        t0 = time.perf_counter()
        rgb = jax.block_until_ready(render(canvas).rgb)
        return rgb, time.perf_counter() - t0
    fn = jax.jit(render_fn(metric, scene, cfg))
    rgb = jax.block_until_ready(fn(canvas.pos, canvas.normal))  # compile
    t0 = time.perf_counter()
    rgb = jax.block_until_ready(fn(canvas.pos, canvas.normal))
    secs = time.perf_counter() - t0
    return rgb, secs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    backends = [sys.argv[2]] if len(sys.argv) > 2 else ["pallas_compact_fast",
                                                        "pallas_compact",
                                                        "pallas", "xla_cm",
                                                        "xla"]
    a = float(sys.argv[3]) if len(sys.argv) > 3 else 0.8
    rgb = None
    for be in backends:
        try:
            rgb, secs = render_disk(n, be, a)
            break
        except Exception as e:
            print(f"backend {be} failed: {e!r}"[:200], file=sys.stderr)
    if rgb is None:
        raise SystemExit("all backends failed")
    from raytracegr_jl_tpu.utils.image import save_png

    path = save_png(f"scenes/disk_{n}.png", rgb)
    print(json.dumps({
        "metric": "accretion_disk_render_rays_per_s",
        "value": round(n * n / secs, 1),
        "unit": "rays/s",
        "image": path,
        "backend": be,
        "seconds": round(secs, 3),
    }))


if __name__ == "__main__":
    main()
