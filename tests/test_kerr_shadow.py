"""Spinning-Kerr end-to-end validation (BASELINE.json config 3).

The reference's own comment shows a = 0.8 as the intended spinning case
(/root/reference/src/RayTraceGR.jl:277) but hard-codes a = 0. Here the full
pipeline is validated against known Kerr physics: the black-hole shadow's
equatorial edges measured from an actual render must match Bardeen's
analytic photon-orbit impact parameters

    xi(r)  = (r^2 (3M - r) - a^2 (M + r)) / (a (r - M))
    eta(r) = r^3 (4 M a^2 - r (r - 3M)^2) / (a^2 (r - M)^2)

with the equatorial shadow edges at the two roots of eta(r) = 0 (i.e.
r (r - 3M)^2 = 4 M a^2), alpha = -xi / sin(theta_obs). For a = 0 both edges
are the Schwarzschild sqrt(27) M. Uses the TEXTBOOK radius formula (real
physics, not the reference's bug-compatible one).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracegr_jl_tpu import (IntegratorConfig, RenderConfig, Sphere,
                               make_metric, make_scene)
from raytracegr_jl_tpu.models.camera import make_canvas
from raytracegr_jl_tpu.ops.metrics import KerrSchildParams
from raytracegr_jl_tpu.render import trace_batch

R_OBS = 50.0


def shadow_edges_analytic(M: float, a: float) -> tuple[float, float]:
    """|alpha| of the two equatorial shadow edges (sorted), Bardeen 1973."""
    if a == 0.0:
        s = float(np.sqrt(27.0) * M)
        return s, s

    def eta_zero(r):
        return r * (r - 3.0 * M) ** 2 - 4.0 * M * a * a

    def bisect(lo, hi):
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            if eta_zero(lo) * eta_zero(mid) <= 0:
                hi = mid
            else:
                lo = mid
        return 0.5 * (lo + hi)

    # eta_zero has roots bracketing r = 3M (prograde below, retrograde above)
    r1 = bisect(M * (1 + 1e-6), 3.0 * M)
    r2 = bisect(3.0 * M, 6.0 * M)

    def xi(r):
        return (r * r * (3.0 * M - r) - a * a * (M + r)) / (a * (r - M))

    return tuple(sorted((abs(xi(r1)), abs(xi(r2)))))


def _measure_edges(a: float, dtype=jnp.float64, backend="xla", ni=192):
    """Render an equatorial strip through the shadow; return sorted |b| of
    the two shadow edges (impact parameters, GR-corrected)."""
    metric = make_metric("kerr_schild", KerrSchildParams(M=1.0, a=a),
                         r_formula="textbook")
    scene = make_scene([Sphere(pos=(0, 0, 0, 0), vel=(1, 0, 0, 0),
                               radius=-80.0)], dtype=dtype)
    nj = 4
    canvas = make_canvas(metric, (0.0, 0.0, -R_OBS, 0.0),
                         (0.0, 0.4, 0.0, 0.0),  # alpha axis: x (equatorial)
                         (0.0, 0.0, 0.0, 0.01),  # thin strip in z
                         (0.0, 0.0, 1.0, 0.0), ni, nj, dtype=dtype)
    cfg = RenderConfig(integrator=IntegratorConfig(
        method="tsit5", rtol=1e-7, atol=1e-7, lam_max=300.0, max_steps=4000,
        stop_rho=1.0), backend=backend)
    y0 = jnp.concatenate([canvas.pos, canvas.normal], axis=-1).reshape(-1, 8)
    res = trace_batch(metric, scene, y0, cfg)
    hit = np.asarray(res.hit).reshape(ni, nj)
    # shadow = captured rays (terminated without reaching the sky sphere)
    shadow = ~hit[:, nj // 2]
    assert shadow.any() and not shadow.all(), "strip must straddle the shadow"
    idx = np.where(shadow)[0]
    lo, hi = idx.min(), idx.max()
    assert 0 < lo and hi < ni - 1, "shadow must not touch the strip edges"

    def b_of(i_edge, i_lit):
        # Exact, coordinate-invariant impact parameter of the edge ray:
        # b = |L/E| from the conserved energy E = -u_t and angular momentum
        # L = u_phi = x u_y - y u_x (covariant components; the metric is
        # stationary + axisymmetric, so both are constants of motion and b
        # equals Bardeen's xi at the shadow boundary — no finite-distance or
        # frame-dragging correction needed). Subpixel: average the last
        # shadow and first lit pixels' b.
        def one(i):
            y = y0.reshape(ni, nj, 8)[i, nj // 2]
            x, u = y[:4], y[4:]
            u_cov = np.asarray(metric(x) @ u)
            E = -u_cov[0]
            L = float(x[1]) * u_cov[2] - float(x[2]) * u_cov[1]
            return abs(L / E)

        return 0.5 * (one(i_edge) + one(i_lit))

    return tuple(sorted((b_of(lo, lo - 1), b_of(hi, hi + 1))))


class TestKerrShadow:
    @pytest.mark.heavy
    def test_schwarzschild_shadow_diameter(self):
        want = shadow_edges_analytic(1.0, 0.0)
        got = _measure_edges(0.0, ni=128)
        np.testing.assert_allclose(got, want, rtol=0.05)

    @pytest.mark.heavy
    def test_spinning_a08_shadow_edges(self):
        """a = 0.8: asymmetric shadow, prograde edge ~3.29 M, retrograde
        ~6.66 M — impossible to fake with a = 0 (symmetric 5.196 M)."""
        want = shadow_edges_analytic(1.0, 0.8)
        assert want[1] / want[0] > 1.8  # the asymmetry is large
        got = _measure_edges(0.8)
        np.testing.assert_allclose(got, want, rtol=0.05)

    @pytest.mark.heavy
    def test_backends_agree_a08(self):
        e_xla = _measure_edges(0.8, backend="xla", ni=128)
        e_cm = _measure_edges(0.8, backend="xla_cm", ni=128)
        np.testing.assert_allclose(e_cm, e_xla, rtol=1e-3)

    @pytest.mark.heavy
    def test_f32_matches_f64_structurally(self):
        e64 = _measure_edges(0.8, dtype=jnp.float64, ni=128)
        e32 = _measure_edges(0.8, dtype=jnp.float32, ni=128)
        np.testing.assert_allclose(e32, e64, rtol=0.03)
