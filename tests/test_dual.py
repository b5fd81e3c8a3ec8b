"""Dual-number layer tests (reference L0, /root/reference/src/RayTraceGR.jl:10-247).

The key property: the explicit Dual implementation and the jacfwd-based
production path are INDEPENDENT forward-mode implementations, so agreement on
the full Kerr-Schild dmetric is a very strong oracle for both (mirrors the
reference testing Duals via exact Rational arithmetic, test/runtests.jl:12-32).
"""

import jax
import jax.numpy as jnp
import numpy as np

import raytracegr_jl_tpu.ops.dual as du
from raytracegr_jl_tpu import KerrSchildParams, dmetric, kerr_schild, minkowski
from raytracegr_jl_tpu.ops.dual import Dual


def _probe_points():
    # the reference's 7 bitmask probe points (test/runtests.jl:41-44)
    return jnp.array([[0.0, 2.0 * (i & 1), 2.0 * (i & 2), 2.0 * (i & 4)]
                      for i in range(1, 8)])


def test_seed_unit_basis():
    x = jnp.array([0.0, 2.0, 1.0, 3.0])
    d = du.seed(x)
    np.testing.assert_array_equal(np.asarray(d.val), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(d.eps), np.eye(4))


def test_arithmetic_rules():
    x = du.seed(jnp.array([1.5, 2.0, -0.5, 3.0]))
    a, b = x[0], x[1]
    # product rule
    p = a * b
    assert float(p.val) == 3.0
    np.testing.assert_allclose(np.asarray(p.eps), [2.0, 1.5, 0.0, 0.0])
    # quotient rule
    q = a / b
    np.testing.assert_allclose(np.asarray(q.eps),
                               [1 / 2.0, -1.5 / 4.0, 0.0, 0.0])
    # lift/promotion: constant has zero tangent (RayTraceGR.jl:23-49)
    s = a + 2.0
    np.testing.assert_allclose(np.asarray(s.eps), [1.0, 0.0, 0.0, 0.0])
    r = 2.0 - a
    np.testing.assert_allclose(np.asarray(r.eps), [-1.0, 0.0, 0.0, 0.0])
    d = 3.0 / b
    np.testing.assert_allclose(np.asarray(d.eps), [0.0, -3.0 / 4.0, 0.0, 0.0])
    # literal pow ^0..^4 (RayTraceGR.jl:132-136)
    for n in range(5):
        pw = a ** n
        np.testing.assert_allclose(np.asarray(pw.eps)[0],
                                   n * 1.5 ** (n - 1) if n else 0.0)


def test_math_functions_match_derivatives():
    t = du.Dual(jnp.array(0.37), jnp.array([1.0]))
    cases = [
        (du.sin, np.cos(0.37)), (du.cos, -np.sin(0.37)),
        (du.exp, np.exp(0.37)), (du.log, 1 / 0.37),
        (du.sqrt, 0.5 / np.sqrt(0.37)),
        (du.asin, 1 / np.sqrt(1 - 0.37 ** 2)),
        (du.acos, -1 / np.sqrt(1 - 0.37 ** 2)),
        (du.atan, 1 / (1 + 0.37 ** 2)),
        (du.cbrt, 1 / (3 * np.cbrt(0.37) ** 2)),
        (du.abs, 1.0),
    ]
    for fn, want in cases:
        out = fn(t)
        np.testing.assert_allclose(float(out.eps[0]), want, rtol=1e-12,
                                   err_msg=fn.__name__)


def test_atan2_correct_vs_bug_compatible():
    y = Dual(jnp.array(0.8), jnp.array([1.0, 0.0]))
    x = Dual(jnp.array(0.6), jnp.array([0.0, 1.0]))
    rho2 = 0.6 ** 2 + 0.8 ** 2
    good = du.atan2(y, x)
    np.testing.assert_allclose(np.asarray(good.eps),
                               [0.6 / rho2, -0.8 / rho2], rtol=1e-12)
    # the reference's rule (RayTraceGR.jl:165-169): x.val*y.eps undivided
    bug = du.atan2(y, x, bug_compatible=True)
    np.testing.assert_allclose(np.asarray(bug.eps),
                               [0.6, -0.8 / rho2], rtol=1e-12)


def test_comparisons_primal_only_and_isless_lexicographic():
    a = Dual(jnp.array(1.0), jnp.array([5.0]))
    b = Dual(jnp.array(1.0), jnp.array([7.0]))
    assert bool(a == b)          # primal-only equality (RayTraceGR.jl:198)
    assert not bool(a < b)       # primal-only order
    assert bool(du.isless(a, b))  # lexicographic val-then-eps (:243-247)
    assert not bool(du.isless(b, a))


def test_isnan_any_component():
    ok = Dual(jnp.array(1.0), jnp.array([0.0, 1.0]))
    bad_eps = Dual(jnp.array(1.0), jnp.array([jnp.nan, 1.0]))
    bad_val = Dual(jnp.array(jnp.nan), jnp.array([0.0, 1.0]))
    assert not bool(du.isnan(ok))
    assert bool(du.isnan(bad_eps))   # RayTraceGR.jl:233-235
    assert bool(du.isnan(bad_val))
    assert not bool(du.isinf(bad_eps))


def test_dual_minkowski_constant_zero_derivative():
    g, dg = du.dmetric_dual(du.minkowski_dual, jnp.zeros(4))
    np.testing.assert_array_equal(np.asarray(g), np.diag([-1.0, 1, 1, 1]))
    np.testing.assert_array_equal(np.asarray(dg), np.zeros((4, 4, 4)))
    # agrees with the production jacfwd path
    g2, dg2 = dmetric(minkowski, jnp.zeros(4))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g2))
    np.testing.assert_array_equal(np.asarray(dg), np.asarray(dg2))


def test_dual_kerr_schild_matches_jacfwd_path():
    """Independent forward-mode oracle vs the production dmetric."""
    for r_formula in ("as_written", "textbook"):
        for M, a in ((1.0, 0.0), (1.3, 0.8)):
            mfn = lambda d: du.kerr_schild_dual(d, M, a, r_formula=r_formula)
            for x in _probe_points():
                g1, dg1 = du.dmetric_dual(mfn, x)
                g2, dg2 = dmetric(
                    lambda xx: kerr_schild(xx, KerrSchildParams(M, a),
                                           r_formula=r_formula), x)
                np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                           rtol=1e-12, atol=1e-14)
                np.testing.assert_allclose(np.asarray(dg1), np.asarray(dg2),
                                           rtol=1e-10, atol=1e-12)


def test_dual_batched_evaluation():
    """Duals carry batch shapes: one call evaluates all probe points."""
    xs = _probe_points()
    g, dg = du.dmetric_dual(lambda d: du.kerr_schild_dual(d, 1.0, 0.0), xs)
    assert g.shape == (7, 4, 4) and dg.shape == (7, 4, 4, 4)
    g0, dg0 = du.dmetric_dual(lambda d: du.kerr_schild_dual(d, 1.0, 0.0),
                              xs[0])
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dg[0]), np.asarray(dg0), rtol=1e-12)


def test_getitem_nondiagonal_eps():
    """ADVICE r1: d[..., i] must select coordinate i's tangent ROW, not
    tangent component i — only distinguishable with an asymmetric eps."""
    val = jnp.asarray([1.0, 2.0, 3.0])
    eps = jnp.asarray([[1.0, 2.0, 3.0],
                       [4.0, 5.0, 6.0],
                       [7.0, 8.0, 9.0]])
    d = du.Dual(val, eps)
    d1 = d[..., 1]
    np.testing.assert_array_equal(np.asarray(d1.val), 2.0)
    np.testing.assert_array_equal(np.asarray(d1.eps), [4.0, 5.0, 6.0])
    # reversal keeps rows attached to their coordinates
    dr = d[..., ::-1]
    np.testing.assert_array_equal(np.asarray(dr.val), [3.0, 2.0, 1.0])
    np.testing.assert_array_equal(np.asarray(dr.eps), np.asarray(eps)[::-1])
    # plain int / leading-axis indexing still works
    b = du.Dual(jnp.stack([val, val + 10]), jnp.stack([eps, eps * 2]))
    np.testing.assert_array_equal(np.asarray(b[1].eps), np.asarray(eps) * 2)


def test_pow_zero_and_one_at_zero_base():
    """ADVICE r1: x**0 must be the constant 1 (zero tangent) even at x=0,
    mirroring the reference's literal_pow guard (RayTraceGR.jl:138)."""
    d = du.Dual(jnp.asarray([0.0, 2.0]), jnp.asarray([[1.0, 0.], [0., 1.]]))
    p0 = d ** 0
    np.testing.assert_array_equal(np.asarray(p0.val), [1.0, 1.0])
    assert np.all(np.asarray(p0.eps) == 0.0)
    assert np.all(np.isfinite(np.asarray(p0.eps)))
    p1 = d ** 1
    np.testing.assert_array_equal(np.asarray(p1.val), np.asarray(d.val))
    np.testing.assert_array_equal(np.asarray(p1.eps), np.asarray(d.eps))


def test_kerr_schild_dual_rho_clamp_matches_production():
    """ADVICE r1: the oracle must share the production path's rho_min clamp
    (metrics.kerr_schild), including tangent semantics, near the origin."""
    near_origin = jnp.asarray([0.0, 1e-5, -2e-5, 5e-6])
    g1, dg1 = du.dmetric_dual(lambda d: du.kerr_schild_dual(d, 1.0, 0.0),
                              near_origin)
    g2, dg2 = dmetric(lambda xx: kerr_schild(xx, KerrSchildParams(1.0, 0.0)),
                      near_origin)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(dg1), np.asarray(dg2),
                               rtol=1e-10, atol=1e-12)
    # clamp_min tangent semantics == jnp.maximum against a constant
    x = jnp.asarray([0.5, 2.0, 1.0])  # below / above / at the threshold
    d = du.Dual(x, jnp.eye(3))
    c = du.clamp_min(d, 1.0)
    val_j, tan_j = jax.jvp(lambda v: jnp.maximum(v, 1.0), (x,), (jnp.ones(3),))
    np.testing.assert_array_equal(np.asarray(c.val), np.asarray(val_j))
    np.testing.assert_allclose(np.asarray(c.eps.sum(-1)), np.asarray(tan_j))


def test_inv_ldiv_rpow_tail_api():
    """VERDICT r3 missing #4: the reference's remaining Dual surface —
    inv (RayTraceGR.jl:107-110), \\ ldiv (:122-131), base**Dual (:145-148)."""
    x = Dual(jnp.array(2.0), jnp.array([1.0, 0.5, 0.0, 0.0]))
    y = Dual(jnp.array(3.0), jnp.array([0.0, 1.0, 2.0, 0.0]))

    iv = du.inv(x)
    ref = 1.0 / x
    np.testing.assert_allclose(float(iv.val), float(ref.val), rtol=1e-15)
    np.testing.assert_allclose(np.asarray(iv.eps), np.asarray(ref.eps),
                               rtol=1e-15)

    # a \ b == b / a, all three overload shapes
    for a, b in [(x, y), (2.0, y), (x, 3.0)]:
        ld = du.ldiv(a, b)
        q = (b / a) if isinstance(b, Dual) else du.lift(b, a) / a
        np.testing.assert_allclose(float(ld.val), float(q.val), rtol=1e-15)
        np.testing.assert_allclose(np.asarray(ld.eps), np.asarray(q.eps),
                                   rtol=1e-15)

    # constant ** Dual: d/dt b^y = b^y log(b) y'
    r = 5.0 ** y
    np.testing.assert_allclose(float(r.val), 5.0 ** 3.0, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(r.eps),
        (5.0 ** 3.0) * np.log(5.0) * np.asarray(y.eps), rtol=1e-12)


def test_hash_isequal_contract():
    """hash/isequal (RayTraceGR.jl:243-248): structural equality over
    (val, eps); equal pairs hash equal, eps changes change the hash."""
    a = Dual(jnp.array([1.0, 2.0]), jnp.array([[0.1, 0.2], [0.3, 0.4]]))
    b = Dual(jnp.array([1.0, 2.0]), jnp.array([[0.1, 0.2], [0.3, 0.4]]))
    c = Dual(jnp.array([1.0, 2.0]), jnp.array([[0.1, 0.2], [0.3, 0.5]]))
    assert bool(jnp.all(du.isequal(a, b)))
    assert not bool(jnp.all(du.isequal(a, c)))
    ha, hb, hc = du.hash_dual(a), du.hash_dual(b), du.hash_dual(c)
    assert bool(jnp.all(ha == hb))
    assert bool(ha[1] != hc[1])  # eps difference changes the hash
    assert bool(ha[0] == hc[0])  # elementwise: untouched lane unchanged


def test_hash_dual_without_x64():
    """ADVICE r4: hash_dual must work under the production TPU config
    (x64 disabled => f32 values, no uint64); the FNV mix runs in uint32."""
    assert jax.config.jax_enable_x64  # CPU suite default; restore below
    jax.config.update("jax_enable_x64", False)
    try:
        a = Dual(jnp.array([1.0, 2.0], jnp.float32),
                 jnp.array([[0.1, 0.2], [0.3, 0.4]], jnp.float32))
        b = Dual(jnp.array([1.0, 2.0], jnp.float32),
                 jnp.array([[0.1, 0.2], [0.3, 0.4]], jnp.float32))
        c = Dual(jnp.array([1.0, 2.0], jnp.float32),
                 jnp.array([[0.1, 0.2], [0.3, 0.5]], jnp.float32))
        ha, hb, hc = du.hash_dual(a), du.hash_dual(b), du.hash_dual(c)
        assert ha.dtype == jnp.uint32
        assert bool(jnp.all(ha == hb))
        assert bool(ha[1] != hc[1])
        assert bool(ha[0] == hc[0])
    finally:
        jax.config.update("jax_enable_x64", True)


def test_kerr_schild_dual_textbook_ring_floor_matches_production():
    """ADVICE r4: the textbook branch of the Dual oracle must apply the same
    rho_min ring-singularity floor as metrics.kerr_schild_radius, so oracle
    and production agree within ~rho_min of the ring (z=0, rho=|a|) too."""
    M, a, rho_min = 1.0, 0.8, 0.25  # grad configs use rho_min=0.25
    # Points on and near the ring singularity for a=0.8.
    pts = jnp.asarray([
        [0.0, a, 0.0, 0.0],          # exactly on the ring
        [0.0, a + 0.05, 0.0, 0.01],  # just outside
        [0.0, a - 0.05, 0.0, -0.02],  # just inside
        [0.0, 0.6, 0.5, 0.001],      # near-ring, off-axis
    ])
    for x in pts:
        g1, dg1 = du.dmetric_dual(
            lambda d: du.kerr_schild_dual(d, M, a, r_formula="textbook",
                                          rho_min=rho_min), x)
        g2, dg2 = dmetric(
            lambda xx: kerr_schild(xx, KerrSchildParams(M, a),
                                   r_formula="textbook", rho_min=rho_min), x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(dg1), np.asarray(dg2),
                                   rtol=1e-10, atol=1e-12)
