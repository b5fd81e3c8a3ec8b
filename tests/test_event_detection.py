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


class TestDetectionGate:
    """Round-5 perf: the interval-certificate gate that cond-skips the
    per-iteration detection sweep must be bitwise-invisible. Grazing rays
    are the adversarial case — the event dips barely below zero inside a
    step — so an unsound envelope or scene bound would flip hits here."""

    @pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32])
    @pytest.mark.parametrize("backend", ["xla_cm", "pallas"])
    def test_gate_bitwise_identical(self, dtype, backend):
        metric = make_metric("minkowski")
        scene = _example1_scene(dtype)
        y0 = _grazing_rays(48, dtype)
        tol = default_tol(dtype)
        outs = {}
        for gate in (True, False):
            cfg = RenderConfig(
                integrator=IntegratorConfig(method="tsit5", rtol=tol,
                                            atol=tol, max_steps=4000,
                                            event_gate=gate),
                backend=backend, pallas_interpret=True)
            res = trace_batch(metric, scene, y0, cfg)
            outs[gate] = (np.asarray(res.y), np.asarray(res.hit),
                          np.asarray(res.lam))
        for a, b in zip(outs[True], outs[False]):
            np.testing.assert_array_equal(a, b)

    def test_gate_bitwise_identical_kerr_rk4(self):
        """rk4 exercises the Hermite envelope branch; Kerr-Schild bends the
        rays so the box certificates see curved steps."""
        from raytracegr_jl_tpu.models.scenes import build, example2_spec
        from raytracegr_jl_tpu import render_fn

        spec = example2_spec(16, 16)
        metric, scene, canvas = build(spec, jnp.float64)
        outs = {}
        for gate in (True, False):
            cfg = RenderConfig(integrator=IntegratorConfig(
                method="rk4", rk4_dt=0.25, max_steps=64, event_gate=gate),
                backend="xla_cm")
            outs[gate] = np.asarray(
                render_fn(metric, scene, cfg)(canvas.pos, canvas.normal))
        np.testing.assert_array_equal(outs[True], outs[False])

    def test_envelope_soundness(self):
        """The static sup-norm envelopes must dominate |b_i(theta)| and the
        Hermite coefficient polynomials on a dense random grid."""
        from raytracegr_jl_tpu.ops.integrate import tsit5_bi
        from raytracegr_jl_tpu.ops.pallas_geodesic import (_BMAX_TSIT5,
                                                           _HERMITE_ENV)

        th = np.random.default_rng(3).uniform(0, 1, 200_001)
        for bm, b in zip(_BMAX_TSIT5, tsit5_bi(th)):
            assert np.abs(np.asarray(b)).max() <= bm
        a1 = th + th * (th - 1) * (1 - 2 * th)
        a2 = th * (th - 1) ** 2
        a3 = th * th * (th - 1)
        for c, a in zip(_HERMITE_ENV, (a1, a2, a3)):
            assert np.abs(a).max() <= c

    def test_scene_bound_is_lower_bound(self):
        """Interval scene bound <= true event value for random points inside
        random boxes (sphere/caelum/plane/disk kinds)."""
        from raytracegr_jl_tpu import Disk
        from raytracegr_jl_tpu.ops.pallas_geodesic import scene_event_cm

        scene = make_scene([
            Sphere(pos=(0, 0, 0, 0), vel=(1, 0, 0, 0), radius=-10.0),
            Plane(time=-20.0),
            Sphere(pos=(0, 1.5, 0, 0), vel=(1, 0, 0, 0), radius=0.5),
            Disk(pos=(0, 0, 0, 0), r_in=2.0, r_out=5.0, half=0.1),
        ])
        event = scene_event_cm(scene)
        bound = event.crossing_bound
        assert bound is not None
        rng = np.random.default_rng(11)
        S, L = 4, 128
        center = rng.uniform(-12, 12, size=(4, S, L))
        width = rng.uniform(0, 3, size=(4, S, L))
        lo = [jnp.asarray(center[c] - width[c]) for c in range(4)]
        hi = [jnp.asarray(center[c] + width[c]) for c in range(4)]
        dlow = np.asarray(bound(lo, hi))
        for _ in range(20):
            u = rng.uniform(0, 1, size=(4, S, L))
            pt = jnp.asarray(center - width + 2 * width * u)
            d = np.asarray(event([pt[c] for c in range(4)]))
            assert (dlow <= d + 1e-12).all()
