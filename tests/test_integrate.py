"""Integrator tests: RK4/Tsit5 convergence on analytic ODEs, adaptive step
control, event localization accuracy, masked batch semantics.

The reference delegates all of this to OrdinaryDiffEq's Tsit5 +
ContinuousCallback (/root/reference/src/RayTraceGR.jl:488-511); here the
batched masked re-derivation is validated against analytic solutions instead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracegr_jl_tpu.ops.integrate import (TS_A, IntegratorConfig,
                                             hairer_init_dt, hermite_interp,
                                             integrate_rays,
                                             integrate_rays_scan, rk4_step,
                                             tsit5_bi, tsit5_interp,
                                             tsit5_step)


def pad8(cols):
    """Embed a small analytic system into the [B, 8] state layout."""
    return jnp.stack(cols, axis=-1)


class TestSteppers:
    def test_rk4_order(self):
        """RK4 local error O(dt^5) on y' = y: halving dt cuts error ~32x."""
        f = lambda y: y
        y0 = jnp.ones((1, 8), jnp.float64)
        errs = []
        for dt in (0.1, 0.05):
            d = jnp.full((1,), dt, jnp.float64)
            y1, _, _, _ = rk4_step(f, y0, d, f(y0))
            errs.append(float(jnp.abs(y1[0, 0] - jnp.exp(dt))))
        assert errs[0] / errs[1] > 25

    def test_tsit5_order(self):
        """Tsit5 local error ~O(dt^6): halving dt cuts error well beyond
        RK4's 16x (observed ~45x at these dt; 64x asymptotically)."""
        f = lambda y: y
        y0 = jnp.ones((1, 8), jnp.float64)
        errs = []
        for dt in (0.1, 0.05):
            d = jnp.full((1,), dt, jnp.float64)
            y1, _, _, _ = tsit5_step(f, y0, d, f(y0))
            errs.append(float(jnp.abs(y1[0, 0] - jnp.exp(dt))))
        assert errs[0] / errs[1] > 40

    def test_tsit5_error_estimate_scales_as_order5(self):
        """The embedded 5(4) difference estimates the 4th-order error, so it
        must scale ~dt^5 (halving dt => ~32x smaller) and bound the true
        5th-order error from above."""
        f = lambda y: y
        y0 = jnp.ones((1, 8), jnp.float64)
        ests, trues = [], []
        for dt in (0.1, 0.05):
            d = jnp.full((1,), dt, jnp.float64)
            y1, err, _, _ = tsit5_step(f, y0, d, f(y0))
            ests.append(float(jnp.abs(err[0, 0])))
            trues.append(float(jnp.abs(y1[0, 0] - jnp.exp(dt))))
        assert 20 < ests[0] / ests[1] < 50      # ~2^5
        assert ests[0] > trues[0] and ests[1] > trues[1]


class TestTsit5DenseOutput:
    """The genuine Tsit5 4th-order interpolant (integrate.tsit5_bi) — the
    dense output OrdinaryDiffEq's ContinuousCallback root-finds on in the
    reference (RayTraceGR.jl:488-490, 510)."""

    def test_weight_identities(self):
        """b_i(0)=0; b_i(1) = the 5th-order solution weights (so theta=1
        reproduces y5 bit-for-bit); b_1'(0)=1 (consistency)."""
        b0 = tsit5_bi(jnp.float64(0.0))
        assert all(abs(float(b)) < 1e-15 for b in b0)
        b1 = tsit5_bi(jnp.float64(1.0))
        # 5th-order weights are TS_A's last row (y5 stage combination),
        # with b7 = 0 (FSAL).
        expect = list(TS_A[5]) + [0.0]
        np.testing.assert_allclose([float(b) for b in b1], expect,
                                   atol=1e-13)
        eps = 1e-7
        db1 = (float(tsit5_bi(jnp.float64(eps))[0])
               - float(b0[0])) / eps
        assert abs(db1 - 1.0) < 1e-6

    def test_endpoints_match_step(self):
        f = lambda y: jnp.sin(y) + 0.5
        y0 = jnp.linspace(0.1, 0.8, 8, dtype=jnp.float64)[None, :]
        dt = jnp.array([0.3], jnp.float64)
        y5, _, _, ks = tsit5_step(f, y0, dt, f(y0))
        at0 = tsit5_interp(y0, ks, dt, jnp.array([0.0], jnp.float64))
        at1 = tsit5_interp(y0, ks, dt, jnp.array([1.0], jnp.float64))
        np.testing.assert_allclose(np.asarray(at0), np.asarray(y0),
                                   atol=1e-15)
        np.testing.assert_allclose(np.asarray(at1), np.asarray(y5),
                                   atol=1e-14)

    def test_fourth_order_beats_hermite(self):
        """On y' = y the interpolant error at mid-step scales ~dt^5 (4th
        order) vs Hermite's ~dt^4 — and is strictly more accurate."""
        f = lambda y: y
        y0 = jnp.ones((1, 8), jnp.float64)
        errs_t, errs_h = [], []
        for dtv in (0.4, 0.2):
            dt = jnp.array([dtv], jnp.float64)
            th = jnp.array([0.5], jnp.float64)
            y5, _, k7, ks = tsit5_step(f, y0, dt, f(y0))
            truth = float(jnp.exp(0.5 * dtv))
            yt = tsit5_interp(y0, ks, dt, th)
            yh = hermite_interp(y0, y5, f(y0), k7, dt, th)
            errs_t.append(abs(float(yt[0, 0]) - truth))
            errs_h.append(abs(float(yh[0, 0]) - truth))
        assert errs_t[0] < errs_h[0] and errs_t[1] < errs_h[1]
        assert errs_t[0] / errs_t[1] > 20      # ~2^5 = 32
        assert errs_h[0] / errs_h[1] < 25      # ~2^4 = 16


class TestHermite:
    def test_endpoints(self):
        y0 = jnp.array([[1.0] * 8])
        y1 = jnp.array([[2.0] * 8])
        f0 = jnp.array([[3.0] * 8])
        f1 = jnp.array([[1.5] * 8])
        dt = jnp.array([0.5])
        a = hermite_interp(y0, y1, f0, f1, dt, jnp.array([0.0]))
        b = hermite_interp(y0, y1, f0, f1, dt, jnp.array([1.0]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(y0), atol=1e-14)
        np.testing.assert_allclose(np.asarray(b), np.asarray(y1), atol=1e-14)

    def test_cubic_exactness(self):
        """Hermite interpolation is exact for cubics."""
        p = lambda t: t**3 - 2 * t**2 + 3 * t + 1
        dp = lambda t: 3 * t**2 - 4 * t + 3
        t0, dt = 0.3, 0.7
        y0 = jnp.full((1, 8), p(t0), jnp.float64)
        y1 = jnp.full((1, 8), p(t0 + dt), jnp.float64)
        f0 = jnp.full((1, 8), dp(t0), jnp.float64)
        f1 = jnp.full((1, 8), dp(t0 + dt), jnp.float64)
        th = 0.37
        got = hermite_interp(y0, y1, f0, f1, jnp.array([dt]), jnp.array([th]))
        np.testing.assert_allclose(float(got[0, 0]), p(t0 + th * dt),
                                   rtol=1e-12)


def circular_rhs(omega):
    """x'' = -omega^2 x embedded in state[..., 0:2] = (x, v)."""
    def f(y):
        x, v = y[..., 0], y[..., 1]
        out = jnp.zeros_like(y)
        return out.at[..., 0].set(v).at[..., 1].set(-omega**2 * x)
    return f


class TestDriver:
    def test_tsit5_harmonic_oscillator(self):
        """Integrate x''=-x to lambda=2pi (no event): returns to start."""
        f = circular_rhs(1.0)
        y0 = jnp.zeros((3, 8), jnp.float64).at[:, 0].set(1.0)
        cfg = IntegratorConfig(method="tsit5", rtol=1e-10, atol=1e-10,
                               lam_max=2 * np.pi, max_steps=2000)
        event = lambda y: jnp.full(y.shape[:1], 1.0, y.dtype)  # never fires
        res = integrate_rays(f, event, y0, cfg)
        assert not bool(jnp.any(res.hit))
        np.testing.assert_allclose(np.asarray(res.lam),
                                   2 * np.pi * np.ones(3), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(res.y[:, 0]), np.ones(3),
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(res.y[:, 1]), np.zeros(3),
                                   atol=1e-7)

    def test_event_localization_linear(self):
        """y' = 1 starting at 0; event at y=3 => lam* = 3 exactly."""
        f = lambda y: jnp.zeros_like(y).at[..., 0].set(1.0)
        y0 = jnp.zeros((2, 8), jnp.float64)
        event = lambda y: 3.0 - y[..., 0]
        cfg = IntegratorConfig(method="tsit5", rtol=1e-10, atol=1e-10,
                               lam_max=10.0, max_steps=500)
        res = integrate_rays(f, event, y0, cfg)
        assert bool(jnp.all(res.hit))
        np.testing.assert_allclose(np.asarray(res.lam), 3.0, atol=1e-8)
        np.testing.assert_allclose(np.asarray(res.y[:, 0]), 3.0, atol=1e-8)

    def test_event_localization_quadratic(self):
        """Free fall x = 1 - t^2/2 hits x=0 at t=sqrt(2)."""
        def f(y):
            return (jnp.zeros_like(y).at[..., 0].set(y[..., 1])
                    .at[..., 1].set(-1.0))
        y0 = jnp.zeros((1, 8), jnp.float64).at[:, 0].set(1.0)
        event = lambda y: y[..., 0]
        cfg = IntegratorConfig(method="tsit5", rtol=1e-12, atol=1e-12,
                               lam_max=10.0, max_steps=500)
        res = integrate_rays(f, event, y0, cfg)
        assert bool(res.hit[0])
        np.testing.assert_allclose(float(res.lam[0]), np.sqrt(2.0), atol=1e-8)

    def test_rays_terminate_independently(self):
        """Mixed batch: one ray hits early, one never hits; each gets its
        own final state (masking correctness)."""
        f = lambda y: jnp.zeros_like(y).at[..., 0].set(y[..., 1])
        y0 = (jnp.zeros((2, 8), jnp.float64)
              .at[0, 1].set(1.0)     # moves +1/lam, hits x=1 at lam=1
              .at[1, 1].set(0.001))  # crawls, never reaches x=1
        event = lambda y: 1.0 - y[..., 0]
        cfg = IntegratorConfig(method="tsit5", rtol=1e-9, atol=1e-9,
                               lam_max=5.0, max_steps=500)
        res = integrate_rays(f, event, y0, cfg)
        assert bool(res.hit[0]) and not bool(res.hit[1])
        np.testing.assert_allclose(float(res.lam[0]), 1.0, atol=1e-7)
        np.testing.assert_allclose(float(res.lam[1]), 5.0, atol=1e-9)
        np.testing.assert_allclose(float(res.y[1, 0]), 0.005, atol=1e-9)

    def test_scan_matches_while(self):
        f = circular_rhs(1.0)
        y0 = jnp.zeros((4, 8), jnp.float64).at[:, 0].set(1.0).at[:, 1].set(0.3)
        event = lambda y: 1.5 - y[..., 0] ** 2 - y[..., 1] ** 2 * 0.0
        cfg = IntegratorConfig(method="tsit5", rtol=1e-9, atol=1e-9,
                               lam_max=3.0, max_steps=300)
        a = integrate_rays(f, event, y0, cfg)
        b = integrate_rays_scan(f, event, y0, cfg)
        np.testing.assert_allclose(np.asarray(a.y), np.asarray(b.y),
                                   rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))

    def test_rk4_fixed_step(self):
        f = circular_rhs(1.0)
        y0 = jnp.zeros((1, 8), jnp.float64).at[:, 0].set(1.0)
        event = lambda y: jnp.full(y.shape[:1], 1.0, y.dtype)
        cfg = IntegratorConfig(method="rk4", rk4_dt=0.01,
                               lam_max=2 * np.pi, max_steps=1000)
        res = integrate_rays(f, event, y0, cfg)
        np.testing.assert_allclose(float(res.y[0, 0]), 1.0, atol=1e-6)

    def test_nan_ray_dies_without_stalling(self):
        """A ray whose RHS is NaN must not hang the while_loop. Component 7
        is a constant per-ray 'bad' flag (its derivative is 0)."""
        def f(y):
            bad = y[..., 7:8] > 0.5
            base = jnp.zeros_like(y).at[..., 0].set(1.0)
            return jnp.where(bad, jnp.nan, base)
        y0 = jnp.zeros((2, 8), jnp.float64).at[1, 7].set(1.0)  # ray 1 is bad
        event = lambda y: jnp.full(y.shape[:1], 1.0, y.dtype)
        cfg = IntegratorConfig(method="tsit5", rtol=1e-9, atol=1e-9,
                               lam_max=1.0, max_steps=200)
        res = integrate_rays(f, event, y0, cfg)
        # good ray finished the span; loop terminated before max_steps
        np.testing.assert_allclose(float(res.lam[0]), 1.0, atol=1e-9)
        np.testing.assert_allclose(float(res.y[0, 0]), 1.0, atol=1e-9)
        assert int(res.n_iters) < 200


class TestInitDt:
    def test_positive_and_finite(self):
        f = circular_rhs(3.0)
        y0 = jax.random.normal(jax.random.PRNGKey(0), (8, 8))
        dt = hairer_init_dt(f, y0, 1e-8, 1e-8)
        assert bool(jnp.all(dt > 0)) and bool(jnp.all(jnp.isfinite(dt)))


def test_null_invariant_conserved_along_geodesics():
    """Physics oracle for integrator quality: the null norm g_ab u^a u^b
    is exactly conserved along geodesics (the camera constructs rays null
    by construction, RayTraceGR.jl:469-474); numerical integration may
    drift it only at the tolerance scale. Catches wrong-Christoffel /
    wrong-contraction bugs that pixel tests can miss (a scaled RHS still
    renders plausible images). Run on the Kerr black-hole scene where the
    dynamics are nontrivial."""
    import numpy as np

    from raytracegr_jl_tpu import RenderConfig, IntegratorConfig
    from raytracegr_jl_tpu.models.scenes import build, example2_spec
    from raytracegr_jl_tpu.render import trace_batch

    dtype = jnp.float64
    spec = example2_spec(12, 12)
    metric, scene, canvas = build(spec, dtype)
    cfg = RenderConfig(integrator=IntegratorConfig(
        method="tsit5", rtol=1e-10, atol=1e-10, max_steps=4000))
    y0 = jnp.concatenate([canvas.pos, canvas.normal], -1).reshape(-1, 8)

    def ugu_rel(y):
        """|u.g.u| normalized by the cancellation magnitude |u|.|g|.|u| —
        the honest conservation metric when |u| spans 1..2e4 (horizon-
        grazing rays legitimately reach huge coordinate velocities)."""
        x, u = y[..., :4], y[..., 4:]
        g = metric(x)
        num = jnp.abs(jnp.einsum("...a,...ab,...b->...", u, g, u))
        den = jnp.einsum("...a,...ab,...b->...", jnp.abs(u), jnp.abs(g),
                         jnp.abs(u))
        return num / (den + 1e-30)

    assert float(ugu_rel(y0).max()) < 1e-12  # null at the camera

    res = trace_batch(metric, scene, y0, cfg)
    # Dead rays (fell into the singularity / error-control abort) are
    # frozen at their last finite state; judge only rays that terminated
    # normally (hit or lam-out).
    alive = np.asarray(res.hit) | (np.asarray(res.lam) > 99.0)
    drift = np.asarray(ugu_rel(res.y))[alive]
    assert alive.sum() > 100  # the scene mostly terminates normally
    # Bulk of rays: conservation at the tolerance scale. The extreme tail
    # (a couple of horizon-grazing rays with |u| ~ 2e4 pushed through
    # near-singular stiffness by error control) loses precision — bound it
    # loosely rather than pretending it doesn't exist.
    assert np.percentile(drift, 90) < 1e-9, np.percentile(drift, 90)
    assert drift.max() < 0.1, f"relative null-norm drift {drift.max():.2e}"
