"""Differentiable-rendering tests: gradients of pixel losses w.r.t. physics
parameters (M, a, sphere pose) — the capability the reference cannot express
(its dual numbers are forward-only, coordinate-tangent-hard-wired;
/root/reference/src/RayTraceGR.jl:10-247)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracegr_jl_tpu.grad import (InverseParams, default_inverse_cfg,
                                    make_loss_fn, make_render_for_params)
from raytracegr_jl_tpu.models.scenes import example2_spec


@pytest.fixture(scope="module")
def setup():
    spec = example2_spec(12, 12)
    cfg = default_inverse_cfg(jnp.float64, max_steps=48, rk4_dt=0.25)
    params0 = InverseParams(
        M=jnp.asarray(1.0), a=jnp.asarray(0.0),
        sphere_pos=jnp.asarray([0.0, 4.0, 0.0, 0.0]))
    render = make_render_for_params(spec, cfg, sphere_index=2,
                                    dtype=jnp.float64)
    target = render(params0)
    return spec, cfg, params0, render, target


def test_loss_zero_at_truth(setup):
    spec, cfg, params0, render, target = setup
    loss = make_loss_fn(spec, target, cfg, dtype=jnp.float64)
    assert float(loss(params0)) == 0.0


def test_grads_finite_and_nonzero(setup):
    spec, cfg, params0, render, target = setup
    loss = make_loss_fn(spec, target, cfg, dtype=jnp.float64)
    perturbed = params0._replace(M=jnp.asarray(1.05))
    g = jax.grad(loss)(perturbed)
    assert np.isfinite(float(g.M))
    assert abs(float(g.M)) > 0


def test_mass_gradient_matches_finite_difference(setup):
    """d(loss)/dM via reverse mode == central finite differences. Smooth
    because the image is compared in the interior (away from a discrete
    hit-flip) via a perturbed M."""
    spec, cfg, params0, render, target = setup
    loss = make_loss_fn(spec, target, cfg, dtype=jnp.float64)

    def lM(M):
        return loss(params0._replace(M=M))

    M0 = 1.03
    g = float(jax.grad(lM)(jnp.asarray(M0)))
    eps = 1e-5
    fd = (float(lM(jnp.asarray(M0 + eps))) -
          float(lM(jnp.asarray(M0 - eps)))) / (2 * eps)
    # discrete hit-boundary flips can contaminate FD; require agreement
    np.testing.assert_allclose(g, fd, rtol=2e-3)


def test_soft_gradients_point_toward_truth():
    """Inverse-rendering signal check (flat space, soft shading + smooth
    colors): the pixel-loss gradient w.r.t. the sphere's z offset has the
    restoring sign throughout the attraction basin. Full optimization runs
    live in benchmarks/; at 12x12 the raw landscape is microscopically
    rough (hard stop-position flips), which vanilla GD is not robust to —
    the restoring-gradient property is what the framework guarantees."""
    from raytracegr_jl_tpu.models.scenes import example1_spec

    spec = example1_spec(12, 12)
    cfg = default_inverse_cfg(jnp.float64, max_steps=48, rk4_dt=0.25,
                              soft_temp=0.05)
    params0 = InverseParams(
        M=jnp.asarray(1.0), a=jnp.asarray(0.0),
        sphere_pos=jnp.asarray([0.0, 0.0, 0.0, 0.0]))
    render = make_render_for_params(spec, cfg, 2, jnp.float64)
    target = render(params0)

    def loss_z(z):
        img = render(params0._replace(
            sphere_pos=jnp.asarray([0.0, 0.0, 0.0, 1.0]) * z))
        return jnp.mean((img - target) ** 2)

    lg = jax.jit(jax.value_and_grad(loss_z))
    for z in (0.05, 0.1):
        _, g = lg(jnp.asarray(z))
        assert float(g) > 0, f"gradient at z={z} should restore toward 0"
        _, g = lg(jnp.asarray(-z))
        assert float(g) < 0, f"gradient at z={-z} should restore toward 0"
