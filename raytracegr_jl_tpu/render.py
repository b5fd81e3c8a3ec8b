"""Render driver: trace all pixel rays through the metric, shade, return canvas.

TPU-native equivalent of the reference's ``trace_rays``
(/root/reference/src/RayTraceGR.jl:482-536): instead of one ODE problem per
pixel in a thread ensemble, the full pixel grid is flattened to a ray batch
``[B, 8]`` and integrated by one masked batched stepper under ``jit``; the
shading pass is a vectorized epilogue. Rays are independent, so the batch
axis shards freely over a device mesh (see ``parallel/``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .models.camera import Canvas
from .models.objects import Scene, min_distance, shade_lanes, shade_soft
from .ops.geometry import MetricFn, geodesic
from .ops.integrate import (IntegratorConfig, TraceResult, integrate_rays,
                            integrate_rays_scan)


class RenderConfig(NamedTuple):
    """Render settings with the reference's defaults.

    ``tol`` default mirrors ``eps(T)^(3/4)`` at RayTraceGR.jl:485; pass
    explicitly for f32 (~2.4e-6). ``hit_dmin`` is the shading threshold at
    RayTraceGR.jl:519."""

    integrator: IntegratorConfig = IntegratorConfig()
    hit_dmin: float = 0.01
    differentiable: bool = False  # scan (grad-capable) vs while_loop (fast)
    backend: str = "xla"  # "xla" (row-major, differentiable) |
    # "xla_cm" (component-major XLA, fast forward) |
    # "pallas" (fused VMEM-resident TPU kernel, fastest forward)
    pallas_interpret: bool = False  # run the Pallas kernel interpreted (CPU)
    soft_temp: float | None = None  # None => reference hard shading;
    # a float => differentiable soft shading (models/objects.shade_soft)
    soft_freq: float = 12.0  # sphere checker frequency for soft shading
    # (12 = reference pattern; inverse rendering wants ~2, see objects.colors)
    shading: str = "reference"  # "reference" (RayTraceGR.jl:513-535 exactly)
    # | "redshift" (g-factor beaming, models/shading.py)
    beaming: float = 4.0  # redshift mode: I_obs = g**beaming * I_emit
    exposure: float = 1.0  # redshift mode: brightness scale before clipping


def default_tol(dtype) -> float:
    """eps(T)^(3/4), the reference's reltol=abstol (RayTraceGR.jl:485)."""
    return float(jnp.finfo(dtype).eps) ** 0.75


def trace_batch(metric: MetricFn, scene: Scene, y0: jax.Array,
                cfg: RenderConfig, metric_cm=None) -> TraceResult:
    """Integrate a flat ray batch ``[B, 8]`` to termination.

    ``backend="pallas"`` runs the fused VMEM-resident kernel
    (ops/pallas_geodesic.py; forward-only). ``metric_cm`` optionally supplies
    the component-major metric; derived from known metrics otherwise.
    """
    rhs = _sanitized_rhs(metric)
    event = lambda y: min_distance(scene, y)
    if cfg.backend in ("pallas", "xla_cm"):
        from .ops.integrate import hairer_init_dt
        from .ops.pallas_geodesic import (integrate_rays_cm,
                                          integrate_rays_pallas,
                                          scene_event_cm)

        if metric_cm is None:
            metric_cm = _metric_cm_of(metric)
        if cfg.integrator.method == "rk4":
            dt0 = jnp.full(y0.shape[:1], cfg.integrator.rk4_dt, y0.dtype)
        else:
            # Initial-dt heuristic through the FAST component-major RHS
            # (closed-form contraction, ~200 ops) instead of the row-major
            # jacfwd path: on the flagship 200x200 render the jacfwd-based
            # hairer_init_dt cost ~10 ms of device time vs ~4 ms for the
            # entire fused integration kernel (round-3 profile).
            from .ops.pallas_geodesic import geodesic_cm

            def rhs_cm(y):  # [B, 8] row-major adapter over geodesic_cm
                return geodesic_cm(metric_cm, y.T[:, None, :])[:, 0, :].T

            dt0 = hairer_init_dt(rhs_cm, y0, cfg.integrator.rtol,
                                 cfg.integrator.atol, 5,
                                 cfg.integrator.lam_max)
        if cfg.differentiable:
            # The Pallas kernel is forward-only; differentiable requests on
            # either cm backend route to a reverse-capable cm driver:
            # the checkpointed custom-VJP integrator (default, fast) or the
            # bounded rematerialized scan (the oracle it is tested against).
            return _trace_differentiable_cm(metric_cm, scene, y0, dt0,
                                            cfg.integrator)
        if cfg.backend == "xla_cm":
            return integrate_rays_cm(metric_cm, scene_event_cm(scene), y0,
                                     dt0, cfg.integrator)
        # Pallas kernels cannot capture array constants: bake the (concrete)
        # scene values in as literals.
        return integrate_rays_pallas(metric_cm,
                                     scene_event_cm(scene, literal=True), y0,
                                     dt0, cfg.integrator,
                                     interpret=cfg.pallas_interpret)
    integ = integrate_rays_scan if cfg.differentiable else integrate_rays
    return integ(rhs, event, y0, cfg.integrator)


def _trace_differentiable_cm(metric_cm, scene: Scene, y0: jax.Array,
                             dt0: jax.Array, integ: IntegratorConfig):
    """Differentiable component-major integration with optional
    impact-parameter-sorted grouping (IntegratorConfig.grad_groups).

    Grouping splits the batch into chunks sorted by impact parameter and
    integrates each with its own checkpointed custom-VJP call
    (ops/adjoint.py): a chunk's while_loop — forward AND backward replay —
    runs only as long as its own slowest ray, so the ~60% of rays that
    terminate in a third of max_steps stop paying for photon-ring
    stragglers. Results are bitwise identical to ungrouped/unsorted (lane
    independence; regression-tested)."""
    from .ops.adjoint import integrate_rays_cm_ckpt
    from .ops.pallas_geodesic import (impact_parameter_order,
                                      integrate_rays_cm_scan,
                                      scene_event_cm)

    event = scene_event_cm(scene)
    mode = integ.grad_mode
    if mode == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        mode = ("ckpt_pallas"
                if on_tpu and getattr(metric_cm, "kerr_recipe", None)
                else "ckpt")
    if mode == "scan":
        return integrate_rays_cm_scan(metric_cm, event, y0, dt0, integ)
    if mode == "ckpt_pallas":
        # Fused Pallas backward (ops/pallas_adjoint.py): needs the static
        # Kerr rebuild recipe; other metrics fall through to the XLA bwd.
        # Scenes whose flattened parameter vector exceeds the kernel's
        # 128-lane cotangent row (> 15 objects) also fall back to the XLA
        # backward rather than silently dropping parameter gradients.
        from .ops.pallas_adjoint import _OBJ_FIELDS
        from .ops.pallas_geodesic import LANES

        n_params = 2 + len(_OBJ_FIELDS) * int(scene.kind.shape[0])
        if (getattr(metric_cm, "kerr_recipe", None) is not None
                and n_params <= LANES):
            from .ops.pallas_adjoint import integrate_rays_cm_ckpt_pallas

            def run(yy, dd):
                return integrate_rays_cm_ckpt_pallas(
                    metric_cm, scene, yy, dd, integ,
                    seg_len=integ.grad_seg_len,
                    interpret=jax.devices()[0].platform != "tpu")

            if not integ.sort_rays:
                return run(y0, dt0)
            # Impact-parameter sorting clusters long-lived rays into few
            # tiles, so the backward kernel's per-tile segment skipping
            # actually fires; results bitwise identical (lane
            # independence), gradients flow through the gathers.
            order, inv = impact_parameter_order(y0)
            res = run(y0[order], dt0[order])
            return TraceResult(y=res.y[inv], lam=res.lam[inv],
                               hit=res.hit[inv], steps=res.steps[inv],
                               n_iters=res.n_iters)

    def integrate(yy, dd):
        return integrate_rays_cm_ckpt(metric_cm, event, yy, dd, integ,
                                      seg_len=integ.grad_seg_len)

    B = y0.shape[0]
    G = integ.grad_groups
    if G <= 1 or B < 2 * G * 128:
        return integrate(y0, dt0)

    order, inv_order = impact_parameter_order(y0)
    ys, ds = y0[order], dt0[order]
    bounds = [round(g * B / G) for g in range(G + 1)]
    parts = [integrate(ys[bounds[g]:bounds[g + 1]],
                       ds[bounds[g]:bounds[g + 1]]) for g in range(G)]
    return TraceResult(
        y=jnp.concatenate([p.y for p in parts])[inv_order],
        lam=jnp.concatenate([p.lam for p in parts])[inv_order],
        hit=jnp.concatenate([p.hit for p in parts])[inv_order],
        steps=jnp.concatenate([p.steps for p in parts])[inv_order],
        n_iters=functools.reduce(jnp.maximum,
                                 [p.n_iters for p in parts]),
    )


def _sanitized_rhs(metric: MetricFn):
    """RHS with the shared dtype-aware magnitude bounds
    (see geometry.sanitize_bounds for the derivation)."""
    from .ops.geometry import sanitize_bounds

    def rhs(y):
        state_clamp, rhs_clamp = sanitize_bounds(y.dtype)
        y_safe = jnp.clip(y, -state_clamp, state_clamp)
        k = jax.vmap(lambda s: geodesic(s, metric))(y_safe)
        return jnp.clip(k, -rhs_clamp, rhs_clamp)
    return rhs


def _metric_cm_of(metric: MetricFn):
    """Component-major metric ``(4,...)->(4,4,...)`` for the Pallas kernel:
    prefer the hand-laid-out version attached by make_metric (no lane-axis
    transposes inside the kernel); otherwise adapt the row-major function."""
    cm = getattr(metric, "component_major", None)
    if cm is not None:
        return cm

    def metric_cm(x):
        # x: (4, S, L) -> row-major (S, L, 4) -> g (S, L, 4, 4) -> (4, 4, S, L)
        xm = jnp.moveaxis(x, 0, -1)
        g = metric(xm)
        return jnp.moveaxis(g, (-2, -1), (0, 1))
    return metric_cm


def trace_rays(metric: MetricFn, scene: Scene, canvas: Canvas,
               cfg: RenderConfig | None = None) -> Canvas:
    """Render: returns a canvas with ``rgb`` filled
    (API parity with RayTraceGR.jl:483)."""
    if cfg is None:
        cfg = RenderConfig(integrator=IntegratorConfig(
            rtol=default_tol(canvas.pos.dtype),
            atol=default_tol(canvas.pos.dtype)))
    ni, nj = canvas.shape
    y0 = jnp.concatenate([canvas.pos, canvas.normal], axis=-1).reshape(-1, 8)
    res = trace_batch(metric, scene, y0, cfg)
    rgb = _shade(metric, scene, y0, res.y, cfg).reshape(ni, nj, 3)
    return canvas._replace(rgb=rgb)


def _shade(metric: MetricFn, scene: Scene, y0: jax.Array, y: jax.Array,
           cfg: RenderConfig) -> jax.Array:
    if cfg.shading == "redshift":
        from .models.shading import shade_redshift
        from .ops.metrics import KerrSchildParams

        p = getattr(metric, "params", KerrSchildParams(M=0.0, a=0.0))
        return shade_redshift(metric, scene, y0, y, p.M, p.a, cfg.hit_dmin,
                              cfg.beaming, cfg.exposure)
    if cfg.soft_temp is not None:
        return shade_soft(scene, y[..., :4], cfg.hit_dmin, cfg.soft_temp,
                          color_freq=cfg.soft_freq)
    # shade_lanes == shade bitwise, but with lane-dense layouts whose VJP
    # avoids the 128-lane-padded [B, N, 3] scatter-adds (~4 ms of a 9 ms
    # fwd+bwd step at 200x200; see its docstring).
    return shade_lanes(scene, y[..., :4], cfg.hit_dmin)


def render_fn(metric: MetricFn, scene: Scene, cfg: RenderConfig):
    """Build a jittable ``(pos, normal) -> rgb`` closure over static config.

    The returned function is the unit the driver jits / shards: pure, static
    shapes, no Python control flow."""

    def fn(pos: jax.Array, normal: jax.Array) -> jax.Array:
        y0 = jnp.concatenate([pos, normal], axis=-1)
        flat = y0.reshape(-1, 8)
        res = trace_batch(metric, scene, flat, cfg)
        rgb = _shade(metric, scene, flat, res.y, cfg)
        return rgb.reshape(pos.shape[:-1] + (3,))

    return fn
