"""Example scenes: the reference's example1/example2
(/root/reference/src/RayTraceGR.jl:542-612) exactly, plus the BASELINE.json
configs the reference lacks — spinning Kerr (``example2_spec(a=..., \
r_formula="textbook")``) and the accretion-disk + gravitational-redshift
scene (``accretion_disk_spec``, rendered with
``RenderConfig(shading="redshift")``).

Unlike the reference — where scenes are hard-coded Julia literals
(README.md:81-84) — scenes here are data: a ``SceneSpec`` pytree the renderer
jits over, so object poses and physics parameters are differentiable inputs.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp

from ..models.camera import Canvas, make_canvas
from ..models.objects import Disk, Plane, Scene, Sphere, make_scene
from ..ops.metrics import KerrSchildParams, make_metric
from ..render import IntegratorConfig, RenderConfig, default_tol, trace_rays


class SceneSpec(NamedTuple):
    metric_name: str
    metric_params: KerrSchildParams
    r_formula: str
    objects: tuple
    cam_pos: tuple
    cam_widthx: tuple
    cam_widthy: tuple
    cam_normal: tuple
    ni: int
    nj: int


def example1_spec(ni: int = 200, nj: int = 200) -> SceneSpec:
    """Flat-space scene (RayTraceGR.jl:542-576): caelum sky sphere (r=-10),
    frustum time-plane (t=-20), unit/2 sphere at origin; 200x200 screen."""
    return SceneSpec(
        metric_name="minkowski",
        metric_params=KerrSchildParams(),
        r_formula="as_written",
        objects=(
            Sphere(pos=(0, 0, 0, 0), vel=(1, 0, 0, 0), radius=-10.0),
            Plane(time=-20.0),
            Sphere(pos=(0, 0, 0, 0), vel=(1, 0, 0, 0), radius=0.5),
        ),
        cam_pos=(0, 0, -2, 0),
        cam_widthx=(0, 1, 0, 0),
        cam_widthy=(0, 0, 0, 1),
        cam_normal=(0, 0, 1, 0),
        ni=ni,
        nj=nj,
    )


def example2_spec(ni: int = 200, nj: int = 200, M: float = 1.0,
                  a: float = 0.0, r_formula: str = "as_written") -> SceneSpec:
    """Black-hole scene (RayTraceGR.jl:578-612): Kerr-Schild hole at the
    origin, visible sphere at x=+4, camera offset x=+4."""
    return SceneSpec(
        metric_name="kerr_schild",
        metric_params=KerrSchildParams(M=M, a=a),
        r_formula=r_formula,
        objects=(
            Sphere(pos=(0, 0, 0, 0), vel=(1, 0, 0, 0), radius=-10.0),
            Plane(time=-20.0),
            Sphere(pos=(0, 4, 0, 0), vel=(1, 0, 0, 0), radius=0.5),
        ),
        cam_pos=(0, 4, -2, 0),
        cam_widthx=(0, 1, 0, 0),
        cam_widthy=(0, 0, 0, 1),
        cam_normal=(0, 0, 1, 0),
        ni=ni,
        nj=nj,
    )


def accretion_disk_spec(ni: int = 1024, nj: int = 1024, M: float = 1.0,
                        a: float = 0.8) -> SceneSpec:
    """Accretion disk around a spinning Kerr black hole (BASELINE.json
    config 4) — real physics, so the TEXTBOOK radius formula.

    Disk annulus rho in [3, 12] M (inner edge at the a=0.8 prograde ISCO
    ~2.9 M), half-thickness 0.1, in the hole's equatorial plane; a caelum
    sky sphere closes the scene. Camera at spatial (0, -20, 4) — inclination
    ~79 deg from the spin axis, close enough to edge-on that Doppler beaming
    of the Keplerian flow (approaching side bright/blue, receding side
    dim/red) and the lensed far side are both visible. Render with
    ``RenderConfig(shading="redshift", integrator=IntegratorConfig(
    stop_rho=1.0, ...))`` — see tests/test_shading.py and
    benchmarks/disk_render.py.
    """
    return SceneSpec(
        metric_name="kerr_schild",
        metric_params=KerrSchildParams(M=M, a=a),
        r_formula="textbook",
        objects=(
            Sphere(pos=(0, 0, 0, 0), vel=(1, 0, 0, 0), radius=-30.0),
            Disk(pos=(0, 0, 0, 0), r_in=3.0, r_out=12.0, half=0.1),
        ),
        cam_pos=(0, 0, -20, 4),
        cam_widthx=(0, 1.3, 0, 0),
        cam_widthy=(0, 0, 0.2549, 1.2748),  # 1.3 * (x_hat cross view_dir)
        cam_normal=(0, 0, 0.9806, -0.1961),  # unit vector toward the hole
        ni=ni,
        nj=nj,
    )


def lensing_inverse_spec(ni: int = 32, nj: int = 32, M: float = 0.5,
                         sphere_x: float = 5.0) -> SceneSpec:
    """The differentiable-inversion demo scene (BASELINE config 5): a
    textured sphere seen PAST a black hole at moderate impact parameter,
    from which gradient descent recovers (M, sphere z) to <1%.

    Design (each choice is load-bearing for a well-posed loss landscape —
    see tests/test_inverse.py and benchmarks/inverse_demo.py):
      * Rays to the sphere pass the hole at impact parameter b in
        ~[3, 7] >> b_crit = 3*sqrt(3)*M ~ 2.6M: strong, smooth deflection
        (~4M/b) with NO near-critical winding — photon-ring rays have
        exponentially amplified (Lyapunov) sensitivities that are
        numerically correct but useless for optimization (a few chaotic
        pixels dominate and sign-randomize the batch gradient; measured on
        example2 at 32x32: per-pixel |d rgb/dM| up to ~5000 vs ~10 for
        regular pixels).
      * The only object is the target sphere: no checkered sky to re-image
        chaotically, no hit/miss silhouette flips in the loss interior.
      * Textbook radius formula (real physics, and the as-written formula's
        r ~ rho^2/2 growth weakens far-field lensing).
      * Fit with RenderConfig(soft_temp~0.05, soft_freq~2): the coarse
        smooth texture widens the M attraction basin ~6x over the
        reference's 12-cell checker (objects.colors docstring).
    """
    return SceneSpec(
        metric_name="kerr_schild",
        metric_params=KerrSchildParams(M=M, a=0.0),
        r_formula="textbook",
        objects=(
            Sphere(pos=(0, sphere_x, 12.0, 0), vel=(1, 0, 0, 0), radius=2.0),
        ),
        cam_pos=(0, 0, -20, 0),
        cam_widthx=(0, 0.9, 0, 0),
        cam_widthy=(0, 0, 0, 0.9),
        cam_normal=(0, 0, 1, 0),
        ni=ni,
        nj=nj,
    )


def build(spec: SceneSpec, dtype=jnp.float64):
    """Materialize (metric_fn, scene, canvas) from a spec."""
    metric = make_metric(spec.metric_name, spec.metric_params,
                         r_formula=spec.r_formula)
    scene = make_scene(spec.objects, dtype=dtype)
    canvas = make_canvas(metric, jnp.asarray(spec.cam_pos, dtype),
                         spec.cam_widthx, spec.cam_widthy, spec.cam_normal,
                         spec.ni, spec.nj)
    return metric, scene, canvas


def render_spec(spec: SceneSpec, dtype=jnp.float64,
                cfg: RenderConfig | None = None) -> Canvas:
    metric, scene, canvas = build(spec, dtype)
    if cfg is None:
        tol = default_tol(dtype)
        method = "rk4" if spec.metric_name == "minkowski" else "tsit5"
        cfg = RenderConfig(integrator=IntegratorConfig(
            method=method, rtol=tol, atol=tol))
    return trace_rays(metric, scene, canvas, cfg)


def example1(ni: int = 200, nj: int = 200, dtype=jnp.float64,
             outfile: str | None = "scenes/sphere.png") -> Canvas:
    """Render + optionally save the flat-space example (RayTraceGR.jl:542)."""
    canvas = render_spec(example1_spec(ni, nj), dtype)
    if outfile:
        from ..utils.image import save_png
        print(f'Output file is "{save_png(outfile, canvas.rgb)}"')
    return canvas


def example2(ni: int = 200, nj: int = 200, dtype=jnp.float64,
             outfile: str | None = "scenes/sphere2.png") -> Canvas:
    """Render + optionally save the black-hole example (RayTraceGR.jl:578)."""
    canvas = render_spec(example2_spec(ni, nj), dtype)
    if outfile:
        from ..utils.image import save_png
        print(f'Output file is "{save_png(outfile, canvas.rgb)}"')
    return canvas
