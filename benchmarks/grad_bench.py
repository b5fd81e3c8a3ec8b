"""Fwd+bwd throughput: rays/s for one differentiable-render training step
(pixel MSE loss -> gradients w.r.t. M, a, sphere pose) on the flagship
Kerr-Schild scene — the inversion workload of BASELINE.json.

The reference has no counterpart (forward-only dual numbers,
/root/reference/src/RayTraceGR.jl:10-247); this fills the
"JAX build fwd+bwd rays/s, 1 chip" row of BASELINE.md.

Usage: python benchmarks/grad_bench.py [N] [--steps K] [--cpu] [--backend B]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=200)
    ap.add_argument("--steps", type=int, default=200,
                    help="bounded-scan step count (dt=0.5 -> lam_max=100, "
                         "the reference's span at RayTraceGR.jl:497)")
    ap.add_argument("--backend", default="xla_cm",
                    choices=["xla", "xla_cm"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from raytracegr_jl_tpu.grad import (InverseParams, default_inverse_cfg,
                                        make_loss_fn, make_render_for_params)
    from raytracegr_jl_tpu.models.scenes import example2_spec
    from raytracegr_jl_tpu.utils.setup import enable_compilation_cache

    enable_compilation_cache()
    dtype = jnp.float32
    spec = example2_spec(args.n, args.n)
    cfg = default_inverse_cfg(
        dtype, max_steps=args.steps, rk4_dt=100.0 / args.steps,
        stop_rho=0.5)._replace(backend=args.backend)

    truth = InverseParams(M=jnp.asarray(1.0, dtype), a=jnp.asarray(0.0, dtype),
                          sphere_pos=jnp.asarray([0.0, 4.0, 0.0, 0.0], dtype))
    render = jax.jit(make_render_for_params(spec, cfg, sphere_index=2,
                                            dtype=dtype))
    target = jax.block_until_ready(render(truth))
    loss_fn = make_loss_fn(spec, target, cfg, sphere_index=2, dtype=dtype)
    step = jax.jit(jax.value_and_grad(loss_fn))

    p = truth._replace(M=jnp.asarray(1.05, dtype))
    loss, g = jax.block_until_ready(step(p))  # compile (excluded)
    assert jnp.isfinite(loss) and jnp.isfinite(g.M), (loss, g)

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(step(p))
        times.append(time.perf_counter() - t0)
    best = min(times)
    # Sustained: pipeline dispatches like a training loop (bench.py
    # methodology — the tunneled chip's ~20 ms round-trip otherwise
    # dominates a ~13 ms step).
    jax.block_until_ready([step(p) for _ in range(3)])
    PIPE = 24
    t0 = time.perf_counter()
    jax.block_until_ready([step(p) for _ in range(PIPE)])
    sustained = PIPE * args.n * args.n / (time.perf_counter() - t0)

    # CHAINED on-device training: K full Adam steps inside one lax.scan —
    # zero host round-trips between steps, exactly how a production fit
    # loop runs (inverse.fit). This is the device-bound number the
    # pipelined estimate approaches from below.
    import optax

    opt = optax.adam(1e-3)

    def adam_step(carry, _):
        params, opt_state = carry
        l, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), l

    K = 24

    @jax.jit
    def run_chain(params):
        (pf, _), losses = jax.lax.scan(adam_step, (params, opt.init(params)),
                                       None, length=K)
        return pf, losses

    pf, losses = jax.block_until_ready(run_chain(p))  # compile (excluded)
    assert bool(jnp.all(jnp.isfinite(losses)))
    t0 = time.perf_counter()
    jax.block_until_ready(run_chain(p))
    chained = K * args.n * args.n / (time.perf_counter() - t0)

    n_rays = args.n * args.n
    print(f"fwd+bwd {args.n}x{args.n} ({args.steps} steps, {args.backend}): "
          f"blocked {best * 1e3:.1f} ms/step ({n_rays / best:,.0f} rays/s), "
          f"sustained {sustained:,.0f} rays/s, "
          f"chained-adam {chained:,.0f} rays/s, "
          f"loss={float(loss):.3e}, dL/dM={float(g.M):+.3e}")


if __name__ == "__main__":
    main()
