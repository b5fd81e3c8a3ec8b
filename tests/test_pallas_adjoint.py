"""Pallas adjoint-kernel tests (interpret mode on CPU; the compiled kernels
are exercised on the chip by tests/test_tpu.py and bench.py).

Validates ops/pallas_adjoint.py — the fused forward-segment and
backward-replay kernels — against the XLA checkpointed-adjoint path
(ops/adjoint.py) and a finite-difference oracle. Configs are deliberately
tiny: tracing the in-kernel vjp graph is expensive, and interpret-mode
execution is op-at-a-time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracegr_jl_tpu.grad import default_inverse_cfg
from raytracegr_jl_tpu.models.scenes import build, example2_spec
from raytracegr_jl_tpu.ops.adjoint import integrate_rays_cm_ckpt
from raytracegr_jl_tpu.ops.metrics import KerrSchildParams, make_metric
from raytracegr_jl_tpu.ops.pallas_adjoint import integrate_rays_cm_ckpt_pallas
from raytracegr_jl_tpu.ops.pallas_geodesic import scene_event_cm


def _setup(dtype=jnp.float64):
    spec = example2_spec(16, 16)
    _, scene, canvas = build(spec, dtype)
    y0 = jnp.concatenate([canvas.pos, canvas.normal], -1).reshape(-1, 8)
    dt0 = jnp.full(y0.shape[:1], 0.4, dtype)
    return spec, scene, y0, dt0


def _loss_of(spec, scene, y0, dt0, cfg, mode, dtype):
    def loss(M):
        metric = make_metric(
            "kerr_schild", KerrSchildParams(M=M, a=jnp.asarray(0.0, dtype)),
            r_formula=spec.r_formula, rho_min=0.25)
        mcm = metric.component_major
        if mode == "pallas":
            res = integrate_rays_cm_ckpt_pallas(mcm, scene, y0, dt0, cfg,
                                                seg_len=2, interpret=True)
        else:
            res = integrate_rays_cm_ckpt(mcm, scene_event_cm(scene), y0,
                                         dt0, cfg, seg_len=2)
        # position-sum loss: exercises the LOOP gradient path (stages),
        # not just the event/shading epilogue
        return jnp.sum(res.y[:, :4] ** 2) * 1e-3

    return loss


def test_pallas_adjoint_rejects_too_many_params():
    """ADVICE r4 (medium): the backward kernel scatters parameter cotangents
    into one 128-lane row, so scenes with > 15 objects (P = 2 + 8*N > 128)
    must be REJECTED with a clear error instead of silently dropping the
    excess cotangents; render routes such scenes to the XLA backward."""
    from raytracegr_jl_tpu.models.objects import Sphere, make_scene
    from raytracegr_jl_tpu.render import (RenderConfig,
                                          _trace_differentiable_cm)

    dtype = jnp.float32
    objs = [Sphere(pos=(0.0, 4.0 + 0.1 * i, 0.0, 0.0),
                   vel=(1.0, 0.0, 0.0, 0.0), radius=0.5)
            for i in range(16)]
    scene = make_scene(objs, dtype)
    metric = make_metric("kerr_schild", KerrSchildParams(1.0, 0.0),
                         rho_min=0.25)
    y0 = jnp.tile(jnp.asarray([[0., 4., -2., 0., 1., 0., 1., 0.]], dtype),
                  (8, 1))
    dt0 = jnp.full((8,), 0.4, dtype)
    cfg = default_inverse_cfg(dtype, max_steps=2, rk4_dt=0.4).integrator

    with pytest.raises(ValueError, match="at most 128"):
        integrate_rays_cm_ckpt_pallas(metric.component_major, scene, y0, dt0,
                                      cfg, seg_len=2, interpret=True)

    # render's dispatcher falls back to the XLA ckpt path instead of raising
    res = _trace_differentiable_cm(
        metric.component_major, scene, y0, dt0,
        cfg._replace(grad_mode="ckpt_pallas"))
    assert np.isfinite(np.asarray(res.y)).all()


@pytest.mark.heavy
@pytest.mark.parametrize("method", ["rk4", "tsit5"])
def test_pallas_adjoint_matches_xla_ckpt(method):
    dtype = jnp.float64
    spec, scene, y0, dt0 = _setup(dtype)
    cfg = default_inverse_cfg(dtype, max_steps=6, method=method, rk4_dt=0.4,
                              stop_rho=0.0).integrator
    vals = {}
    for mode in ["xla", "pallas"]:
        loss = _loss_of(spec, scene, y0, dt0, cfg, mode, dtype)
        l, gM = jax.value_and_grad(loss)(jnp.asarray(1.05, dtype))
        vals[mode] = (float(l), float(gM))
    # primals bitwise-level equal; gradients to accumulation order
    np.testing.assert_allclose(vals["pallas"][0], vals["xla"][0],
                               rtol=1e-12)
    np.testing.assert_allclose(vals["pallas"][1], vals["xla"][1], rtol=1e-8)
    assert vals["pallas"][1] != 0.0


@pytest.mark.heavy
def test_pallas_adjoint_rk4_matches_fd():
    """FD oracle is meaningful for rk4 only: the adaptive tsit5 paths
    deliberately stop gradients through the dt controller, which a raw FD
    includes."""
    dtype = jnp.float64
    spec, scene, y0, dt0 = _setup(dtype)
    cfg = default_inverse_cfg(dtype, max_steps=6, method="rk4", rk4_dt=0.4,
                              stop_rho=0.0).integrator
    loss = _loss_of(spec, scene, y0, dt0, cfg, "pallas", dtype)
    l, gM = jax.value_and_grad(loss)(jnp.asarray(1.05, dtype))
    eps = 1e-6
    fd = (loss(jnp.asarray(1.05 + eps)) - loss(jnp.asarray(1.05 - eps))) \
        / (2 * eps)
    np.testing.assert_allclose(float(gM), float(fd), rtol=1e-5)


@pytest.mark.heavy
def test_pallas_adjoint_spinning_textbook():
    """a != 0 exercises the full spin branches of the in-kernel metric
    rebuild AND the round-4 ring-singularity floor: zero-state padding
    lanes sit exactly on the textbook ring (z=0, rho=|a| after clamping)
    where r was 0 and k3 = z/r = 0/0 = NaN — a primal NaN whose 0*NaN
    products poisoned the kernel's (M, a) cotangent sums."""
    dtype = jnp.float64
    spec = example2_spec(16, 16)
    _, scene, canvas = build(spec, dtype)
    y0 = jnp.concatenate([canvas.pos, canvas.normal], -1).reshape(-1, 8)
    dt0 = jnp.full(y0.shape[:1], 0.4, dtype)
    cfg = default_inverse_cfg(dtype, max_steps=6, method="tsit5",
                              stop_rho=0.0).integrator

    def loss_of(mode):
        def loss(Ma):
            M, a = Ma
            metric = make_metric("kerr_schild", KerrSchildParams(M=M, a=a),
                                 r_formula="textbook", rho_min=0.25)
            mcm = metric.component_major
            if mode == "pallas":
                res = integrate_rays_cm_ckpt_pallas(
                    mcm, scene, y0, dt0, cfg, seg_len=2, interpret=True)
            else:
                res = integrate_rays_cm_ckpt(
                    mcm, scene_event_cm(scene), y0, dt0, cfg, seg_len=2)
            return jnp.sum(res.y[:, :4] ** 2) * 1e-3

        return loss

    vals = {}
    for mode in ["xla", "pallas"]:
        l, g = jax.value_and_grad(loss_of(mode))(
            (jnp.asarray(1.05, dtype), jnp.asarray(0.3, dtype)))
        vals[mode] = (float(l), float(g[0]), float(g[1]))
    assert np.isfinite(vals["pallas"][1]) and np.isfinite(vals["pallas"][2])
    np.testing.assert_allclose(vals["pallas"][0], vals["xla"][0], rtol=1e-12)
    # per-tile vs global cotangent summation order: ~1e-7..1e-6 relative
    np.testing.assert_allclose(vals["pallas"][1], vals["xla"][1], rtol=1e-5)
    np.testing.assert_allclose(vals["pallas"][2], vals["xla"][2], rtol=1e-5)
