"""Pallas fused-kernel tests, run in interpreter mode on CPU (the compiled
kernel is exercised on real TPU via RTGR_TPU_TESTS=1 and the bench driver).
Validates the component-major math against the reference XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracegr_jl_tpu import (IntegratorConfig, KerrSchildParams,
                               RenderConfig, christoffel, make_metric,
                               trace_rays)
from raytracegr_jl_tpu.models.scenes import build, example1_spec, example2_spec
from raytracegr_jl_tpu.ops.pallas_geodesic import (christoffel_cm,
                                                   geodesic_cm,
                                                   kerr_schild_cm,
                                                   minkowski_cm, sym4_inv)


class TestComponentMajorMath:
    def test_sym4_inv(self):
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (4, 4, 2, 8), jnp.float64)
        g = jnp.einsum("ab...,cb...->ac...", a, a) + 4 * jnp.eye(4)[..., None, None]
        gu = sym4_inv(g)
        prod = jnp.einsum("ab...,bc...->ac...", g, gu)
        np.testing.assert_allclose(
            np.asarray(prod), np.broadcast_to(np.eye(4)[..., None, None],
                                              prod.shape), atol=1e-10)

    def test_kerr_schild_cm_matches_row_major(self):
        metric = make_metric("kerr_schild", KerrSchildParams(1.0, 0.3),
                             r_formula="textbook")
        mcm = kerr_schild_cm(KerrSchildParams(1.0, 0.3), "textbook")
        x = jnp.array([[0.0, 2.0, 1.0, 3.0], [1.0, -1.0, 0.5, 2.0]]).T
        x_cm = x[:, :, None]  # (4, 2, 1)
        g_cm = mcm(x_cm)[..., 0]  # (4, 4, 2)
        g_rm = metric(x.T)  # (2, 4, 4)
        np.testing.assert_allclose(np.asarray(jnp.moveaxis(g_cm, -1, 0)),
                                   np.asarray(g_rm), rtol=1e-12)

    def test_christoffel_cm_matches(self):
        metric = make_metric("kerr_schild", KerrSchildParams(1.0, 0.0))
        mcm = kerr_schild_cm(KerrSchildParams(1.0, 0.0), "as_written")
        x = jnp.array([0.0, 2.0, 1.0, 3.0])
        gam_rm = christoffel(metric, x)
        x_cm = x[:, None, None]
        gam_cm = christoffel_cm(mcm, x_cm)[..., 0, 0]
        np.testing.assert_allclose(np.asarray(gam_cm), np.asarray(gam_rm),
                                   rtol=1e-10, atol=1e-12)

    def test_geodesic_cm_minkowski(self):
        mcm = minkowski_cm()
        y = jnp.arange(8.0)[:, None, None]
        ydot = geodesic_cm(mcm, y)[..., 0, 0]
        np.testing.assert_array_equal(np.asarray(ydot[:4]),
                                      np.arange(4.0, 8.0))
        np.testing.assert_array_equal(np.asarray(ydot[4:]), np.zeros(4))


class TestPallasRender:
    @pytest.mark.parametrize("spec_fn,method", [
        (example1_spec, "rk4"),
        (example2_spec, "tsit5"),
    ])
    def test_matches_xla_backend(self, spec_fn, method):
        dtype = jnp.float32
        spec = spec_fn(16, 8)
        metric, scene, canvas = build(spec, dtype)
        integ = IntegratorConfig(method=method, rtol=3e-6, atol=3e-6,
                                 max_steps=400, rk4_dt=0.1)
        cfg_x = RenderConfig(integrator=integ)
        cfg_p = RenderConfig(integrator=integ, backend="pallas",
                             pallas_interpret=True)
        rgb_x = np.asarray(trace_rays(metric, scene, canvas, cfg_x).rgb)
        rgb_p = np.asarray(trace_rays(metric, scene, canvas, cfg_p).rgb)
        # identical hit/shade classification for (nearly) every pixel;
        # f32 step-sequence roundoff may flip an isolated boundary pixel
        frac_same = (np.abs(rgb_p - rgb_x).max(-1) < 1e-3).mean()
        assert frac_same > 0.97, f"only {frac_same:.3f} pixels match"

    def test_sort_rays_bitwise_identical(self):
        """ADVICE r3: sort_rays' central claim — bitwise-identical results
        to unsorted — regression-tested. Holds because per-ray arithmetic is
        lane-wise independent; a future kernel change introducing cross-lane
        reductions would break this loudly."""
        from raytracegr_jl_tpu.ops.pallas_geodesic import (
            LANES, TILE_S, integrate_rays_pallas, scene_event_cm)
        from raytracegr_jl_tpu.render import _metric_cm_of

        dtype = jnp.float32
        spec = example2_spec(48, 48)  # 2304 rays > one tile => sorting acts
        metric, scene, canvas = build(spec, dtype)
        y0 = jnp.concatenate([canvas.pos, canvas.normal], -1).reshape(-1, 8)
        assert y0.shape[0] > TILE_S * LANES
        cfg = IntegratorConfig(method="tsit5", rtol=3e-6, atol=3e-6,
                               max_steps=400)
        mcm = _metric_cm_of(metric)
        ev = scene_event_cm(scene, literal=True)
        dt0 = jnp.full(y0.shape[:1], 0.01, dtype)
        a = integrate_rays_pallas(mcm, ev, y0, dt0, cfg, interpret=True,
                                  sort_rays=False)
        b = integrate_rays_pallas(mcm, ev, y0, dt0, cfg, interpret=True,
                                  sort_rays=True)
        np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y))
        np.testing.assert_array_equal(np.asarray(a.lam), np.asarray(b.lam))
        np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
        np.testing.assert_array_equal(np.asarray(a.steps),
                                      np.asarray(b.steps))


class TestXlaCmBackend:
    @pytest.mark.heavy
    def test_forward_matches_row_major_f64(self):
        """Component-major XLA driver vs row-major, f64: near-bitwise."""
        spec = example2_spec(12, 8)
        metric, scene, canvas = build(spec, jnp.float64)
        integ = IntegratorConfig(method="tsit5", rtol=1e-9, atol=1e-9,
                                 max_steps=1000)
        rgb_rm = np.asarray(trace_rays(
            metric, scene, canvas, RenderConfig(integrator=integ)).rgb)
        rgb_cm = np.asarray(trace_rays(
            metric, scene, canvas,
            RenderConfig(integrator=integ, backend="xla_cm")).rgb)
        np.testing.assert_allclose(rgb_cm, rgb_rm, atol=1e-9)

    @pytest.mark.heavy
    def test_differentiable_cm_scan(self):
        """backend='xla_cm' + differentiable routes to the reverse-capable
        cm scan and yields finite parameter gradients. Was @slow in rounds
        1-2 (reverse compile took minutes); the analytic metric derivative
        + Sherman-Morrison inverse + lean event localization cut the
        reverse graph enough to run in the default suite (~40 s CPU).
        Gradient-path parity with the row-major backend: see test_grad."""
        from raytracegr_jl_tpu.grad import (InverseParams,
                                            default_inverse_cfg,
                                            make_loss_fn,
                                            make_render_for_params)

        spec = example2_spec(8, 8)
        cfg = default_inverse_cfg(jnp.float64, max_steps=24, rk4_dt=0.5,
                                  stop_rho=0.5)._replace(backend="xla_cm")
        params = InverseParams(M=jnp.asarray(1.05), a=jnp.asarray(0.0),
                               sphere_pos=jnp.asarray([0.0, 4.0, 0.0, 0.0]))
        render = make_render_for_params(spec, cfg, 2, jnp.float64)
        target = render(params._replace(M=jnp.asarray(1.0)))
        loss = make_loss_fn(spec, target, cfg, 2, jnp.float64)
        g = jax.grad(loss)(params)
        assert np.isfinite(float(g.M))
        assert np.isfinite(np.asarray(g.sphere_pos)).all()


class TestClosedFormContraction:
    def test_ks_parts_geodesic_matches_christoffel(self):
        """The closed-form geodesic contraction (ks_parts fast path in
        geodesic_cm: directional derivatives of f and k instead of the
        full 4x4x4 Christoffel algebra) is algebraically exact — verify
        against the explicit Gamma^a_bc u^b u^c contraction at random
        states, both r formulas, spinning and not."""
        from raytracegr_jl_tpu.ops.pallas_geodesic import christoffel_cm_list

        key = jax.random.PRNGKey(1)
        y = jax.random.normal(key, (8, 3, 5), jnp.float64) * 2.0
        for a_spin, rf in [(0.0, "as_written"), (0.8, "textbook"),
                           (0.3, "textbook")]:
            m = kerr_schild_cm(KerrSchildParams(1.2, a_spin), rf)
            assert hasattr(m, "ks_parts")
            fast = geodesic_cm(m, y)
            yl = [y[i] for i in range(8)]
            xl, ul = yl[:4], yl[4:]
            gam = christoffel_cm_list(m, xl)
            udot_ref = []
            for a in range(4):
                acc = 0.0
                for b in range(4):
                    for c in range(4):
                        g_abc = gam[a][b][c]
                        if isinstance(g_abc, float):
                            continue
                        acc = acc + g_abc * ul[b] * ul[c]
                udot_ref.append(-acc)
            ref = jnp.stack(ul + udot_ref)
            np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                       rtol=1e-9, atol=1e-10,
                                       err_msg=f"a={a_spin} {rf}")

    def test_analytic_dlist_matches_jvp(self):
        """The hand-derived (g, dg) (dlist_fn) equals the jvp-per-coordinate
        fallback for both metrics and r formulas."""
        from raytracegr_jl_tpu.ops.pallas_geodesic import (_asarr,
                                                           dmetric_cm_list)

        key = jax.random.PRNGKey(0)
        xl = [jax.random.normal(jax.random.fold_in(key, i), (3, 5),
                                jnp.float64) * 2 for i in range(4)]
        for a_spin, rf in [(0.0, "as_written"), (0.8, "textbook")]:
            m = kerr_schild_cm(KerrSchildParams(1.2, a_spin), rf)
            g_j, dg_j = dmetric_cm_list(m.list_fn, xl)
            g_a, dg_a = m.dlist_fn(xl)
            for i in range(4):
                for j in range(4):
                    np.testing.assert_allclose(
                        np.asarray(g_a[i][j]), np.asarray(g_j[i][j]),
                        rtol=1e-12)
            for c in range(4):
                for i in range(4):
                    for j in range(4):
                        np.testing.assert_allclose(
                            np.asarray(_asarr(dg_a[c][i][j], xl[0])),
                            np.asarray(dg_j[c][i][j]), rtol=1e-9,
                            atol=1e-12, err_msg=f"dg[{c}][{i}][{j}]")
