"""Geodesic/geometry tests: Christoffel symmetry, analytic Schwarzschild-free
checks, null-vector preservation, ray packing (reference layer L2/L3,
/root/reference/src/RayTraceGR.jl:298-370)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracegr_jl_tpu import (KerrSchildParams, Ray, christoffel, geodesic,
                               kerr_schild, make_metric, minkowski, r2s, s2r)
from raytracegr_jl_tpu.ops.geometry import geodesic_batched


def test_ray_packing_roundtrip():
    s = jnp.arange(8.0)
    r = s2r(s)
    np.testing.assert_array_equal(np.asarray(r.x), np.arange(4.0))
    np.testing.assert_array_equal(np.asarray(r.u), np.arange(4.0, 8.0))
    np.testing.assert_array_equal(np.asarray(r2s(r)), np.asarray(s))


def test_christoffel_symmetry():
    """Gamma^a_bc = Gamma^a_cb (torsion-free connection)."""
    x = jnp.array([0.0, 2.0, 1.0, 3.0])
    gamma = christoffel(kerr_schild, x)
    np.testing.assert_allclose(np.asarray(gamma),
                               np.asarray(jnp.swapaxes(gamma, -1, -2)),
                               atol=1e-12)


def test_geodesic_flat_space_straight():
    """In Minkowski, udot = 0: rays are straight lines."""
    s = jnp.array([0.0, 1.0, 2.0, 3.0, 1.0, 0.5, -0.3, 0.2])
    sdot = geodesic(s, minkowski)
    np.testing.assert_array_equal(np.asarray(sdot[:4]), np.asarray(s[4:]))
    np.testing.assert_array_equal(np.asarray(sdot[4:]), np.zeros(4))


def test_null_norm_conserved_along_geodesic():
    """d/dlam (g_ab u^a u^b) = 0 along a geodesic — analytic identity that
    validates the full metric->christoffel->RHS chain."""
    metric = make_metric("kerr_schild", KerrSchildParams(1.0, 0.0))
    x = jnp.array([0.0, 4.0, -2.0, 0.1])
    u = jnp.array([1.3, 0.2, 0.9, -0.1])

    def norm2(s):
        g = metric(s[:4])
        return s[4:] @ g @ s[4:]

    s = jnp.concatenate([x, u])
    sdot = geodesic(s, metric)
    dnorm = jax.grad(norm2)(s) @ sdot
    assert abs(float(dnorm)) < 1e-10


def test_geodesic_batched_matches_pointwise():
    metric = make_metric("kerr_schild")
    key = jax.random.PRNGKey(0)
    s = jax.random.normal(key, (16, 8)) + jnp.array(
        [0.0, 4.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0])
    f = geodesic_batched(metric)
    out = f(s)
    ref = jnp.stack([geodesic(si, metric) for si in s])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)


def test_christoffel_finite_difference_identity():
    """Check Gamma against its definition from metric derivatives."""
    metric = make_metric("kerr_schild", KerrSchildParams(1.0, 0.5),
                         r_formula="textbook")
    x = jnp.array([0.0, 2.0, 1.5, 0.7])
    gamma = christoffel(metric, x)
    eps = 1e-6
    dg = np.zeros((4, 4, 4))
    for c in range(4):
        dx = jnp.zeros(4).at[c].set(eps)
        dg[:, :, c] = np.asarray(
            (metric(x + dx) - metric(x - dx)) / (2 * eps))
    g = np.asarray(metric(x))
    gu = np.linalg.inv(g)
    gl = 0.5 * (dg + dg.transpose(0, 2, 1) - dg.transpose(2, 0, 1))
    expect = np.einsum("ad,dbc->abc", gu, gl)
    np.testing.assert_allclose(np.asarray(gamma), expect, atol=1e-7)
