"""Sharded-program evidence on an N-device mesh (virtual CPU devices when
real multi-chip hardware is absent): compiles the sharded forward render and
the sharded inversion train step, and reports the partitioning FACTS from the
executables themselves — per-device FLOP fraction and collective counts —
plus numerical agreement with the single-device program.

Wall-clock scaling cannot be measured on virtual devices (they timeshare one
host), so this reports what CAN be verified without hardware; the same
program shape runs unmodified on a real slice (jax.distributed +
parallel.sharding.global_pixels — see tests/test_multihost.py for the
2-process execution path).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/scaling.py [n_devices]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _flops(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return ca["flops"]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    from raytracegr_jl_tpu import IntegratorConfig, RenderConfig, render_fn
    from raytracegr_jl_tpu.grad import (InverseParams, default_inverse_cfg,
                                        flat_pixel_grid, make_ray_loss_fn,
                                        make_ray_render_for_params)
    from raytracegr_jl_tpu.models.scenes import build, example2_spec
    from raytracegr_jl_tpu.parallel.sharding import (make_mesh, shard_pixels,
                                                     sharded_render,
                                                     sharded_value_and_grad)

    dtype = jnp.float32
    mesh = make_mesh(jax.devices()[:n])
    spec = example2_spec(8 * n, 16)

    # --- forward render ---
    metric, scene, canvas = build(spec, dtype)
    cfg = RenderConfig(integrator=IntegratorConfig(
        method="tsit5", rtol=1e-5, atol=1e-5, max_steps=256))
    render = render_fn(metric, scene, cfg)
    pos_s, norm_s = shard_pixels(mesh, canvas.pos, canvas.normal)
    fwd = sharded_render(render, mesh).lower(pos_s, norm_s).compile()
    fwd1 = jax.jit(render).lower(canvas.pos, canvas.normal).compile()
    fwd_ratio = _flops(fwd) / _flops(fwd1)

    # --- inversion train step ---
    icfg = default_inverse_cfg(dtype, max_steps=16, rk4_dt=0.5, stop_rho=0.5)
    truth = InverseParams(M=jnp.asarray(1.0, dtype),
                          a=jnp.asarray(0.0, dtype),
                          sphere_pos=jnp.asarray([0., 4., 0., 0.], dtype))
    xg, ng = flat_pixel_grid(spec, dtype)
    rr = make_ray_render_for_params(spec, icfg, 2, dtype)
    target = rr(truth, xg, ng)
    loss = make_ray_loss_fn(spec, icfg, 2, dtype)
    p = truth._replace(M=jnp.asarray(1.05, dtype))
    batch_s = shard_pixels(mesh, xg, ng, target)
    vg = sharded_value_and_grad(loss, mesh)
    step = vg.lower(p, *batch_s).compile()
    step1 = jax.jit(jax.value_and_grad(loss)).lower(p, xg, ng,
                                                    target).compile()
    step_ratio = _flops(step) / _flops(step1)
    n_allreduce = step.as_text().count("all-reduce")

    # numerical agreement
    l_s, g_s = vg(p, *batch_s)
    l_1, g_1 = jax.jit(jax.value_and_grad(loss))(p, xg, ng, target)
    agree = bool(np.isclose(float(l_s), float(l_1), rtol=1e-5)
                 and np.isclose(float(g_s.M), float(g_1.M), rtol=1e-3))

    print(json.dumps({
        "metric": "sharding_evidence",
        "n_devices": n,
        "forward_per_device_flops_fraction": round(fwd_ratio, 4),
        "train_step_per_device_flops_fraction": round(step_ratio, 4),
        "train_step_all_reduce_count": n_allreduce,
        "ideal_fraction": round(1.0 / n, 4),
        "loss_and_gradM_agree_with_single_device": agree,
    }))


if __name__ == "__main__":
    main()
