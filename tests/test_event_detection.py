"""Event-detection robustness: grazing hits and thin objects.

Interval sampling of the event function — the reference's ContinuousCallback
(interp_points=10, /root/reference/src/RayTraceGR.jl:488-490) and our default
detector alike — misses crossings whose negative window falls between
samples. Analytically, 53 of the example1 golden's silhouette pixels are TRUE
sphere hits the reference's solver never saw (closed-form ray-sphere
intersection; straight rays in Minkowski space make the oracle exact).
``IntegratorConfig(refine_minima=True)`` adds trisection refinement of
interior event minima so such hits are caught.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracegr_jl_tpu import (IntegratorConfig, Plane, RenderConfig, Sphere,
                               make_metric, make_scene)
from raytracegr_jl_tpu.models.camera import pixel_rays
from raytracegr_jl_tpu.render import default_tol, trace_batch


def _example1_scene(dtype=jnp.float64):
    return make_scene([
        Sphere(pos=(0, 0, 0, 0), vel=(1, 0, 0, 0), radius=-10.0),
        Plane(time=-20.0),
        Sphere(pos=(0, 0, 0, 0), vel=(1, 0, 0, 0), radius=0.5),
    ], dtype=dtype)


def _grazing_rays(n=64, dtype=jnp.float64):
    """Rays from the example1 camera aimed just inside the sphere silhouette.

    Camera at (0, 0, -2, 0); a straight ray toward spatial direction
    (dx, 1, dy)/|.| grazes the radius-0.5 sphere when its closest approach
    rho_min = |p - (p.n)n| is just below 0.5. Analytic (exact) oracle.
    """
    metric = make_metric("minkowski")
    rng = np.random.default_rng(7)
    x0s, u0s, truly_hits = [], [], []
    while len(x0s) < n:
        ang = rng.uniform(0, 2 * np.pi)
        # target rho_min in (0.487, 0.4999): inside but close to silhouette
        rho = rng.uniform(0.487, 0.4999)
        # for camera on the -y axis at distance 2, rho_min = 2 sin(alpha)
        # with alpha the angle between the ray and the +y axis
        alpha = np.arcsin(rho / 2.0)
        t = np.tan(alpha)
        dx, dy = t * np.cos(ang), t * np.sin(ang)
        p = np.array([0.0, -2.0, 0.0])
        d = np.array([dx, 1.0, dy])
        d /= np.linalg.norm(d)
        s0 = -p @ d
        rho_min2 = p @ p - s0 * s0
        x0, u0 = pixel_rays(metric, jnp.asarray([0.0, 0.0, -2.0, 0.0], dtype),
                            jnp.asarray([0.0, dx, 1.0, dy], dtype))
        x0s.append(np.asarray(x0))
        u0s.append(np.asarray(u0))
        truly_hits.append(rho_min2 < 0.25)
    assert all(truly_hits)
    return (jnp.asarray(np.concatenate([np.stack(x0s), np.stack(u0s)],
                                       axis=-1), dtype))


class TestGrazingDetection:
    def _trace(self, y0, refine: bool, backend="xla"):
        metric = make_metric("minkowski")
        scene = _example1_scene()
        tol = default_tol(jnp.float64)
        cfg = RenderConfig(
            integrator=IntegratorConfig(method="tsit5", rtol=tol, atol=tol,
                                        max_steps=4000,
                                        refine_minima=refine),
            backend=backend)
        res = trace_batch(metric, scene, y0, cfg)
        # hit the SMALL sphere (rho ~ 0.5), not the caelum (rho ~ 10)
        rho_hit = jnp.linalg.norm(res.y[:, 1:4], axis=-1)
        return np.asarray(res.hit & (rho_hit < 1.0))

    def test_refinement_catches_all_true_grazes(self):
        y0 = _grazing_rays(64)
        got = self._trace(y0, refine=True)
        assert got.all(), f"missed {int((~got).sum())}/64 analytic hits"

    def test_sampling_alone_misses_some(self):
        """The artifact exists: the reference-compatible detector (and the
        reference itself, hence 53 golden silhouette pixels) misses a
        fraction of true grazing hits."""
        y0 = _grazing_rays(64)
        got = self._trace(y0, refine=False)
        assert not got.all()

    @pytest.mark.heavy
    def test_cm_backend_matches(self):
        y0 = _grazing_rays(32)
        a = self._trace(y0, refine=True, backend="xla")
        b = self._trace(y0, refine=True, backend="xla_cm")
        np.testing.assert_array_equal(a, b)


class TestThinObject:
    def test_thin_plane_sphere_shell(self):
        """A thin shell (sphere pair would need CSG; use a thin disk slab):
        a ray crossing a half=0.02 disk almost face-on has a negative event
        window ~0.04/|u_z| << the sample spacing of a large step; minimum
        refinement must catch the crossing."""
        from raytracegr_jl_tpu import Disk

        metric = make_metric("minkowski")
        scene = make_scene([Disk(pos=(0, 0, 0, 0), r_in=1.0, r_out=6.0,
                                 half=0.02)])
        x0, u0 = pixel_rays(metric, jnp.asarray([0.0, 3.0, 0.0, 5.0]),
                            jnp.asarray([0.0, 0.0, 0.0, -1.0]))
        y0 = jnp.concatenate([x0, u0])[None, :]
        tol = default_tol(jnp.float64)
        base = IntegratorConfig(method="tsit5", rtol=tol, atol=tol,
                                max_steps=4000)
        hit_ref = trace_batch(metric, scene, y0,
                              RenderConfig(integrator=base)).hit
        hit_ref2 = trace_batch(
            metric, scene, y0,
            RenderConfig(integrator=base._replace(refine_minima=True))).hit
        # flat-space steps grow to dt ~ 10-100; the slab window is ~0.06 in
        # lambda, far below dt/9 — sampling misses, refinement hits
        assert not bool(hit_ref[0])
        assert bool(hit_ref2[0])
