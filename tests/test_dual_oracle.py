"""Reference-independent END-TO-END pixel-gradient oracle (VERDICT r4 #5).

ops/dual_oracle.py re-renders the rk4 differentiable config entirely in the
hand-rolled Dual arithmetic of ops/dual.py (the counterpart of the
reference's own AD layer, /root/reference/src/RayTraceGR.jl:10-247) with a
width-1 tangent carrying d/dM — no jax.jvp/jax.grad/jacfwd anywhere in the
oracle. Agreement between jax.grad of the production pipeline and the
oracle is therefore a cross-check between two INDEPENDENT AD
implementations, closing the "gradient parity without Julia" gap that
finite differences (noisy near discrete events) could not.

Config note: max_steps=20 (lambda <= 5) keeps every ray short of the
black-hole plunge region. Plunging trajectories are chaotic — two
algebraically equivalent implementations whose primals differ by 1e-16
diverge to O(1) within ~10 near-horizon steps — so event decisions there
are a roundoff lottery NO oracle can match (the production path handles
them with stop_rho capture semantics instead).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracegr_jl_tpu.grad import (InverseParams, default_inverse_cfg,
                                    flat_pixel_grid,
                                    make_ray_render_for_params)
from raytracegr_jl_tpu.models.scenes import build, example2_spec
from raytracegr_jl_tpu.ops.dual_oracle import render_dual_dM


@pytest.mark.heavy
def test_dual_oracle_matches_jax_end_to_end():
    dtype = jnp.float64
    spec = example2_spec(8, 8)
    n_steps = 20
    cfg = default_inverse_cfg(dtype, max_steps=n_steps, method="rk4",
                              rk4_dt=0.25)
    _, scene0, _ = build(spec, dtype)
    M0 = 1.05
    params = InverseParams(M=jnp.asarray(M0, dtype),
                           a=jnp.asarray(0.0, dtype),
                           sphere_pos=scene0.pos[2])
    render = make_ray_render_for_params(spec, cfg, 2, dtype)
    xg, ng = flat_pixel_grid(spec, dtype)

    rgb = np.asarray(render(params, xg, ng))
    rgb_o, drgb_o = render_dual_dM(
        scene0, xg, ng, M0, 0.0, r_formula=spec.r_formula, rho_min=1e-3,
        rk4_dt=0.25, n_steps=n_steps,
        interp_points=cfg.integrator.interp_points,
        bisect_iters=cfg.integrator.bisect_iters)
    rgb_o, drgb_o = np.asarray(rgb_o), np.asarray(drgb_o)

    # The test must not pass vacuously: the lensed sphere is visible and
    # its pixels carry real d/dM signal.
    n_hit = int((np.abs(rgb[:, 2] - 1.0) < 0.01).sum())
    assert n_hit >= 3
    assert np.abs(drgb_o).max() > 0.1

    # (1) primal parity: two implementations of the same pipeline
    np.testing.assert_allclose(rgb_o, rgb, atol=1e-12)

    # (2) jax FORWARD mode vs the Dual oracle, per pixel
    _, jv = jax.jvp(lambda m: render(params._replace(M=m), xg, ng),
                    (jnp.asarray(M0, dtype),), (jnp.asarray(1.0, dtype),))
    np.testing.assert_allclose(np.asarray(jv), drgb_o, atol=1e-12)

    # (3) jax REVERSE mode vs the Dual oracle on the inversion loss
    target = np.asarray(
        render(params._replace(M=jnp.asarray(1.0, dtype)), xg, ng))

    def loss(m):
        r = render(params._replace(M=m), xg, ng)
        return jnp.mean((r - jnp.asarray(target)) ** 2)

    g_rev = float(jax.grad(loss)(jnp.asarray(M0, dtype)))
    g_oracle = float(np.mean(2.0 * (rgb_o - target) * drgb_o))
    assert g_rev != 0.0
    np.testing.assert_allclose(g_rev, g_oracle, rtol=1e-9)


@pytest.mark.heavy
def test_dual_oracle_pose_gradient_matches_jax():
    """The POSE path (sphere center z): flows through the event Newton/IFT
    polish, the which-object boundaries, and the checker-texture angles —
    exactly where finite differences are least trustworthy. The oracle's
    width-1 center tangent must match jax forward and reverse mode."""
    from raytracegr_jl_tpu.ops.dual_oracle import render_dual_sensitivity

    dtype = jnp.float64
    spec = example2_spec(8, 8)
    n_steps = 20
    cfg = default_inverse_cfg(dtype, max_steps=n_steps, method="rk4",
                              rk4_dt=0.25)
    _, scene0, _ = build(spec, dtype)
    M0 = 1.05
    params = InverseParams(M=jnp.asarray(M0, dtype),
                           a=jnp.asarray(0.0, dtype),
                           sphere_pos=scene0.pos[2])
    render = make_ray_render_for_params(spec, cfg, 2, dtype)
    xg, ng = flat_pixel_grid(spec, dtype)

    rgb_o, dz_o = render_dual_sensitivity(
        scene0, xg, ng, M0, 0.0, wrt=("pos", 2, 3),
        r_formula=spec.r_formula, rho_min=1e-3, rk4_dt=0.25,
        n_steps=n_steps, interp_points=cfg.integrator.interp_points,
        bisect_iters=cfg.integrator.bisect_iters)
    rgb_o, dz_o = np.asarray(rgb_o), np.asarray(dz_o)
    assert np.abs(dz_o).max() > 1.0  # checker angles slide fast under z

    def rz(z):
        p = params._replace(sphere_pos=params.sphere_pos.at[3].set(z))
        return render(p, xg, ng)

    _, jvz = jax.jvp(rz, (params.sphere_pos[3],),
                     (jnp.asarray(1.0, dtype),))
    np.testing.assert_allclose(np.asarray(jvz), dz_o, atol=1e-11)

    target = np.asarray(render(params, xg, ng)) * 0.9  # any fixed target

    def loss(z):
        return jnp.mean((rz(z) - jnp.asarray(target)) ** 2)

    g_rev = float(jax.grad(loss)(params.sphere_pos[3]))
    g_oracle = float(np.mean(2.0 * (rgb_o - target) * dz_o))
    assert g_rev != 0.0
    np.testing.assert_allclose(g_rev, g_oracle, rtol=1e-9)
