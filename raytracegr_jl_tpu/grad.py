"""Differentiable rendering: pixel-loss gradients w.r.t. physics parameters.

The flagship capability the reference cannot express at all (its dual numbers
are forward-only and hard-wired to 4-coordinate tangents): reverse-mode AD
through the full pipeline — camera null-ray construction, geodesic
integration (bounded masked scan), surface shading — down to the Kerr-Schild
mass M, spin a, and object poses. This powers the "differentiable inversion"
config of BASELINE.json (fit physics parameters to an observed image).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .models.camera import make_canvas
from .models.objects import Scene
from .models.scenes import SceneSpec, build
from .ops.metrics import KerrSchildParams, make_metric
from .render import IntegratorConfig, RenderConfig, render_fn


class InverseParams(NamedTuple):
    """Learnable physics parameters for inversion."""

    M: jax.Array  # black-hole mass
    a: jax.Array  # spin
    sphere_pos: jax.Array  # [4] pose of the visible sphere


def make_render_for_params(spec: SceneSpec, cfg: RenderConfig,
                           sphere_index: int, dtype=jnp.float32):
    """Build ``params -> rgb [ni, nj, 3]``, fully traced in the params.

    The camera is rebuilt per call because pixel null-normals depend on the
    metric (hence on M, a) — gradients flow through ray setup too, matching
    the physics.
    """
    _, scene0, _ = build(spec, dtype)

    def render(params: InverseParams) -> jax.Array:
        metric = make_metric(
            spec.metric_name,
            KerrSchildParams(M=params.M, a=params.a),
            r_formula=spec.r_formula,
        )
        scene = scene0._replace(
            pos=scene0.pos.at[sphere_index].set(params.sphere_pos))
        canvas = make_canvas(metric, jnp.asarray(spec.cam_pos, dtype),
                             spec.cam_widthx, spec.cam_widthy,
                             spec.cam_normal, spec.ni, spec.nj)
        return render_fn(metric, scene, cfg)(canvas.pos, canvas.normal)

    return render


def make_loss_fn(spec: SceneSpec, target_rgb: jax.Array, cfg: RenderConfig,
                 sphere_index: int = 2, dtype=jnp.float32):
    """Pixel MSE loss ``params -> scalar`` against a target image.

    ``cfg`` must use the differentiable integrator path
    (``RenderConfig(differentiable=True)``): the forward while_loop is not
    reverse-differentiable, the bounded masked scan is.
    """
    render = make_render_for_params(spec, cfg, sphere_index, dtype)

    def loss(params: InverseParams) -> jax.Array:
        rgb = render(params)
        return jnp.mean((rgb - target_rgb) ** 2)

    return loss


def default_inverse_cfg(dtype=jnp.float32, max_steps: int = 64,
                        method: str = "rk4", rk4_dt: float = 0.25,
                        soft_temp: float | None = None,
                        stop_rho: float = 0.0) -> RenderConfig:
    """A bounded-scan config sized for gradient work (memory scales with
    max_steps; use jax.checkpoint wrapping for longer integrations).

    ``soft_temp``: enable differentiable soft shading
    (models/objects.shade_soft) — essential for optimization, since the
    reference's hard shading is piecewise constant in the parameters."""
    tol = float(jnp.finfo(dtype).eps) ** 0.75
    return RenderConfig(
        integrator=IntegratorConfig(method=method, rk4_dt=rk4_dt,
                                    rtol=tol, atol=tol, max_steps=max_steps,
                                    interp_points=4, bisect_iters=20,
                                    stop_rho=stop_rho, state_cap=1e6),
        differentiable=True,
        soft_temp=soft_temp,
    )
