"""raytracegr_jl_tpu — a TPU-native differentiable general-relativistic ray
tracer, built from scratch in JAX/XLA/Pallas.

Same capabilities as the reference eschnett/RayTraceGR.jl (and its public API
surface: D, minkowski, kerr_schild, dmetric, christoffel, Ray, r2s, s2r,
geodesic, Sphere, Plane, make_canvas, trace_rays, example1, example2 — see
/root/reference/src/RayTraceGR.jl exports), redesigned TPU-first:

  * forward-mode metric derivatives via jax.jacfwd instead of hand-rolled
    dual numbers; reverse mode (pixel -> physics-parameter gradients) for free
  * one batched masked ODE stepper over [B, 8] ray state instead of a
    one-ODE-per-ray thread ensemble
  * fused Pallas TPU kernels for the hot geodesic RHS + RK loop
  * pixel grid sharded over a jax.sharding.Mesh for multi-chip scaling
"""

from .ops.metrics import (D, KerrSchildParams, kerr_schild, make_metric,
                          minkowski)
from .ops.dual import Dual
from .ops.geometry import (Ray, christoffel, dmetric, geodesic, r2s, s2r)
from .ops.integrate import IntegratorConfig, TraceResult, integrate_rays
from .models.objects import (Disk, Plane, Scene, Sphere, distances,
                             make_scene, min_distance, shade, shade_soft)
from .models.shading import g_factors, keplerian_velocity, shade_redshift
from .models.camera import Canvas, make_canvas
from .models.scenes import (SceneSpec, accretion_disk_spec, build, example1,
                            example1_spec, example2, example2_spec,
                            render_spec)
from .render import RenderConfig, default_tol, render_fn, trace_rays
from .utils.image import canvas_to_image, load_png, save_png

__version__ = "0.1.0"
