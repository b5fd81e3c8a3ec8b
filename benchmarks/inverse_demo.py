"""End-to-end differentiable-inversion demo (BASELINE config 5): recover
the black-hole mass M and a sphere's z-position to <1% from a single
self-rendered 32x32 image by gradient descent through the full pipeline
(camera -> geodesic integration -> soft shading).

The reference cannot express this at all (forward-only dual numbers,
/root/reference/src/RayTraceGR.jl:10-247). Scene design rationale:
models/scenes.lensing_inverse_spec. Result recorded in BASELINE.md.

Usage: python benchmarks/inverse_demo.py [--steps N] [--cpu]
Prints one JSON line with recovered values and relative errors.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from raytracegr_jl_tpu.grad import (InverseParams, default_inverse_cfg,
                                        make_render_for_params)
    from raytracegr_jl_tpu.inverse import fit
    from raytracegr_jl_tpu.models.scenes import lensing_inverse_spec
    from raytracegr_jl_tpu.utils.setup import enable_compilation_cache

    enable_compilation_cache()
    dtype = jnp.float32
    M_TRUE, Z_TRUE = 0.5, 0.0
    spec = lensing_inverse_spec(32, 32, M=M_TRUE)
    cfg = default_inverse_cfg(dtype, max_steps=120, rk4_dt=0.5,
                              soft_temp=0.05,
                              stop_rho=0.5)._replace(backend="xla_cm",
                                                     soft_freq=2.0)
    cfg = cfg._replace(integrator=cfg.integrator._replace(lam_max=60.0))

    truth = InverseParams(M=jnp.asarray(M_TRUE, dtype),
                          a=jnp.asarray(0.0, dtype),
                          sphere_pos=jnp.asarray([0., 5., 12., Z_TRUE], dtype))
    render = jax.jit(make_render_for_params(spec, cfg, 0, dtype))
    target = jax.block_until_ready(render(truth))

    init = truth._replace(M=jnp.asarray(0.55, dtype),  # 10% off
                          sphere_pos=jnp.asarray([0., 5., 12., 0.05], dtype))
    trainable = InverseParams(M=1.0, a=0.0,
                              sphere_pos=jnp.asarray([0., 0., 0., 1.], dtype))
    t0 = time.time()
    # Two-phase schedule (round 5): EXPLORE at a high lr that can cross the
    # rough texture landscape, restart the POLISH phase from the
    # best-loss iterate at 10x lower lr. A single long cosine run is
    # trajectory-fragile here — Adam's sign-normalized steps overshoot M
    # through the optimum into a secondary basin on some seeds (the
    # best-iterate tracking still saves the result, but z never
    # converges). The explore/polish split recovers BOTH parameters to
    # ~f32 precision (measured: M exact, z ~3e-8, loss ~1e-15) and is
    # robust to ulp-level primal shifts across code versions.
    n1 = args.steps // 2
    n2 = args.steps - n1
    r1 = fit(spec, target, init, cfg, steps=n1,
             learning_rate=optax.cosine_decay_schedule(5e-3, n1, alpha=0.1),
             sphere_index=0, trainable=trainable, dtype=dtype)
    res = fit(spec, target, r1.params, cfg, steps=n2,
              learning_rate=optax.cosine_decay_schedule(5e-4, n2,
                                                        alpha=0.02),
              sphere_index=0, trainable=trainable, dtype=dtype)
    if float(r1.loss) < float(res.loss):  # polish must never lose ground
        res = r1
    wall = time.time() - t0
    m = float(res.params.M)
    z = float(res.params.sphere_pos[3])
    print(json.dumps({
        "metric": "inverse_recovery",
        "M_true": M_TRUE, "M_recovered": round(m, 5),
        "M_rel_err_pct": round(abs(m - M_TRUE) / M_TRUE * 100, 3),
        "z_true": Z_TRUE, "z_recovered": round(z, 6),
        "z_abs_err": round(abs(z - Z_TRUE), 6),
        "init_M": 0.55, "init_z": 0.05,
        "steps": args.steps, "resolution": "32x32",
        "final_loss": float(res.loss), "wall_s": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
