"""Accretion-disk object + gravitational-redshift shading tests
(BASELINE.json config 4; the reference's dangling metric-shading hook at
/root/reference/src/RayTraceGR.jl:416).

Oracles: signed-distance contract (RayTraceGR.jl:377-383), exact identities
of the g-factor plumbing (frequency = conserved -k_t scaled by the observer
lapse for static observers), and qualitative GR physics (gravitational
redshift depth, Doppler asymmetry of a Keplerian disk).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracegr_jl_tpu import (Disk, IntegratorConfig, RenderConfig, Sphere,
                               distances, make_metric, make_scene,
                               min_distance)
from raytracegr_jl_tpu.models.shading import (camera_frequency, g_factors,
                                              keplerian_velocity,
                                              normalize_timelike,
                                              shade_redshift)
from raytracegr_jl_tpu.ops.metrics import KerrSchildParams


def disk_scene(dtype=jnp.float64):
    return make_scene([
        Sphere(pos=(0, 0, 0, 0), vel=(1, 0, 0, 0), radius=-30.0),
        Disk(pos=(0, 0, 0, 0), r_in=3.0, r_out=12.0, half=0.1),
    ], dtype=dtype)


class TestDiskDistance:
    def test_signed_distance_contract(self):
        sc = make_scene([Disk(pos=(0, 0, 0, 0), r_in=3.0, r_out=12.0,
                              half=0.1)])
        d = lambda p: float(distances(sc, jnp.asarray(p, jnp.float64))[0])
        assert d([0, 6.0, 0, 0.0]) < 0  # inside the annulus midplane
        assert d([0, 6.0, 0, 0.5]) > 0  # above the slab
        assert d([0, 1.0, 0, 0.0]) > 0  # inside the hole (rho < r_in)
        assert d([0, 20.0, 0, 0.0]) > 0  # beyond the rim
        assert d([0, 0, -6.0, 0.0]) < 0  # rotationally symmetric
        # zero on the slab surface
        assert abs(d([0, 6.0, 0, 0.1])) < 1e-12

    def test_event_cm_matches_row_major(self):
        from raytracegr_jl_tpu.ops.pallas_geodesic import scene_event_cm
        sc = disk_scene()
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.uniform(-15, 15, (256, 8)))
        want = min_distance(sc, y)
        y_cm = y.T.reshape(8, 2, 128)
        got = scene_event_cm(sc)(y_cm).reshape(256)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12)


class TestKeplerian:
    def test_unit_norm_and_angular_velocity(self):
        metric = make_metric("kerr_schild", KerrSchildParams(M=1.0, a=0.0),
                             r_formula="textbook")
        x = jnp.asarray([0.0, 6.0, 0.0, 0.0])
        g = metric(x)
        u = keplerian_velocity(g, x, jnp.zeros(4), 1.0, 0.0)
        norm = jnp.einsum("a,ab,b->", u, g, u)
        assert abs(float(norm) + 1.0) < 1e-12
        # Omega = u^phi/u^t = sqrt(M)/rho^1.5; at (6,0,0) u^phi = u^y/rho
        omega = float(u[2] / (6.0 * u[0]))
        assert abs(omega - 1.0 / 6.0**1.5) < 1e-12

    def test_spin_shifts_prograde_omega(self):
        metric = make_metric("kerr_schild", KerrSchildParams(M=1.0, a=0.8),
                             r_formula="textbook")
        x = jnp.asarray([0.0, 6.0, 0.0, 0.0])
        g = metric(x)
        u = keplerian_velocity(g, x, jnp.zeros(4), 1.0, 0.8)
        omega = float(u[2] / (6.0 * u[0]))
        # Bardeen-Press-Teukolsky: Omega = sqrt(M)/(rho^1.5 + a sqrt(M))
        assert abs(omega - 1.0 / (6.0**1.5 + 0.8)) < 1e-12


def _trace_one(metric, scene, pos, normal, dtype=jnp.float64, **ikw):
    """Trace a single ray (camera-normalized) to termination; returns y0, y."""
    from raytracegr_jl_tpu.models.camera import pixel_rays
    from raytracegr_jl_tpu.render import default_tol, trace_batch

    x0, u0 = pixel_rays(metric, jnp.asarray(pos, dtype),
                        jnp.asarray(normal, dtype))
    y0 = jnp.concatenate([x0, u0])[None, :]
    tol = default_tol(dtype)
    cfg = RenderConfig(integrator=IntegratorConfig(
        method="tsit5", rtol=tol, atol=tol, **ikw))
    res = trace_batch(metric, scene, y0, cfg)
    assert bool(res.hit[0]), "ray must hit for the shading test"
    return y0, res.y


class TestGFactor:
    def test_camera_frequency_identity(self):
        """omega_obs == -k0^t / sqrt(-g^tt) exactly (any metric, any ray)."""
        metric = make_metric("kerr_schild", KerrSchildParams(M=1.0, a=0.6),
                             r_formula="textbook")
        from raytracegr_jl_tpu.models.camera import pixel_rays
        x0, k0 = pixel_rays(metric, jnp.asarray([0., 5., -9., 2.]),
                            jnp.asarray([0., -0.3, 1.0, 0.1]))
        y0 = jnp.concatenate([x0, k0])[None, :]
        w = float(camera_frequency(metric, y0)[0])
        gu = jnp.linalg.inv(metric(x0))
        want = float(-k0[0] / jnp.sqrt(-gu[0, 0]))
        assert abs(w - want) < 1e-12
        assert w > 0

    def test_static_emitter_gravitational_redshift(self):
        """End-to-end: ray from a far camera onto a static sphere deep in a
        Schwarzschild well is REDshifted by ~sqrt(1 - 2M/r)."""
        metric = make_metric("kerr_schild", KerrSchildParams(M=1.0, a=0.0),
                             r_formula="textbook")
        scene = make_scene([
            Sphere(pos=(0, 0, -4.0, 0), vel=(1, 0, 0, 0), radius=0.5),
        ])
        # camera at rho=50 aimed straight at the sphere (radial ray)
        y0, y = _trace_one(metric, scene, [0., 0., -50., 0.],
                           [0., 0., 1.0, 0.])
        gf = float(g_factors(metric, scene, y0, y, 1.0, 0.0)[0, 0])

        # (a) plumbing: matches the manual frequency ratio exactly
        x_hit, k_hit = y[0, :4], y[0, 4:]
        g_hit = metric(x_hit)
        u_static = normalize_timelike(g_hit, jnp.asarray([1., 0., 0., 0.]))
        w_emit = float(jnp.einsum("a,ab,b->", u_static, g_hit, k_hit))
        w_obs = float(camera_frequency(metric, y0)[0])
        assert w_emit > 0 and w_obs > 0
        assert abs(gf - w_obs / w_emit) < 1e-10

        # (b) physics: E = -k_t conserved along the geodesic (stationary
        # metric) — integrator-accuracy check
        E0 = float(-(metric(y0[0, :4]) @ y0[0, 4:])[0])
        E1 = float(-(g_hit @ k_hit)[0])
        assert abs(E1 - E0) < 1e-8 * abs(E0)

        # (c) magnitude: dominated by sqrt(1 - 2M/r_hit), small camera-frame
        # correction at rho_obs = 50
        r_hit = float(jnp.linalg.norm(x_hit[1:]))
        approx = float(jnp.sqrt(1 - 2.0 / r_hit))
        assert gf < 1.0
        assert abs(gf - approx) < 0.05

    def test_keplerian_doppler_sign(self):
        """Approaching limb blueshifted (g>static), receding limb redshifted."""
        metric = make_metric("kerr_schild", KerrSchildParams(M=1.0, a=0.0),
                             r_formula="textbook")
        scene = disk_scene()
        # Nearly edge-on camera at y=-30, z=+1.5 aimed at the +-x limbs of
        # the rho~6 annulus. Prograde flow Omega(-y, x): at x<0 the matter
        # moves toward the camera (blue), at x>0 away (red).
        g_vals = {}
        for side in (-1.0, 1.0):
            y0, y = _trace_one(metric, scene, [0., side * 6.0, -30., 1.5],
                               [0., 0., 1.0, -0.044], stop_rho=1.0)
            # object 1 is the disk
            g_vals[side] = float(g_factors(metric, scene, y0, y,
                                           1.0, 0.0)[0, 1])
        assert g_vals[-1.0] > 1.05  # blueshifted approaching side
        assert g_vals[1.0] < 0.95  # redshifted receding side


class TestRedshiftRender:
    @pytest.mark.heavy
    def test_disk_render_brightness_asymmetry(self):
        """Small end-to-end redshift render: finite, non-empty, and the
        approaching (-x) half outshines the receding (+x) half."""
        from raytracegr_jl_tpu.models.scenes import accretion_disk_spec, build

        dtype = jnp.float64
        spec = accretion_disk_spec(ni=32, nj=32, M=1.0, a=0.0)
        metric, scene, canvas = build(spec, dtype)
        cfg = RenderConfig(
            integrator=IntegratorConfig(method="rk4", rk4_dt=0.1,
                                        max_steps=700, stop_rho=1.0),
            shading="redshift")
        from raytracegr_jl_tpu import trace_rays
        out = trace_rays(metric, scene, canvas, cfg)
        rgb = np.asarray(out.rgb)
        assert np.isfinite(rgb).all()
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0
        assert rgb.max() > 0.05  # something is lit
        ni = rgb.shape[0]
        left, right = rgb[: ni // 2].mean(), rgb[ni // 2:].mean()
        assert left > 1.2 * right

    def test_reference_shade_still_works_with_disk(self):
        """The reference-quirk shading path must tolerate disk objects."""
        from raytracegr_jl_tpu import shade
        sc = disk_scene()
        rgb = shade(sc, jnp.asarray([[0., 6., 0., 0.], [0., 25., 0., 0.]]))
        rgb = np.asarray(rgb)
        assert np.isfinite(rgb).all()
        # second point misses everything => reference red
        np.testing.assert_allclose(rgb[1], [1.0, 0.0, 0.0])


def test_disk_serialization_roundtrip(tmp_path):
    from raytracegr_jl_tpu.models.scenes import accretion_disk_spec
    from raytracegr_jl_tpu.models.serialize import load_spec, save_spec

    spec = accretion_disk_spec(ni=16, nj=16, a=0.8)
    path = save_spec(str(tmp_path / "disk.json"), spec)
    back = load_spec(path)
    assert back == spec
