"""Real-TPU tests (opt-in: RTGR_TPU_TESTS=1). These exercise the compiled
Pallas kernel and the component-major XLA path on actual hardware — the
CPU suite covers the same code in interpret/virtual-device mode."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu():
    import jax

    if os.environ.get("RTGR_TPU_TESTS") != "1":
        pytest.skip("set RTGR_TPU_TESTS=1")
    dev = jax.devices()[0]
    if dev.platform not in ("tpu",):
        pytest.skip(f"not a TPU: {dev}")
    from raytracegr_jl_tpu.utils.setup import enable_compilation_cache

    enable_compilation_cache()
    return dev


def test_pallas_kernel_renders_flagship(tpu):
    import jax
    import jax.numpy as jnp

    from raytracegr_jl_tpu import IntegratorConfig, RenderConfig, render_fn
    from raytracegr_jl_tpu.models.scenes import build, example2_spec
    from raytracegr_jl_tpu.render import default_tol

    dtype = jnp.float32
    spec = example2_spec(64, 64)
    metric, scene, canvas = build(spec, dtype)
    tol = default_tol(dtype)
    cfg = RenderConfig(integrator=IntegratorConfig(
        method="tsit5", rtol=tol, atol=tol, max_steps=20_000),
        backend="pallas")
    rgb = jax.jit(render_fn(metric, scene, cfg))(canvas.pos, canvas.normal)
    rgb = np.asarray(rgb)
    assert np.isfinite(rgb).all()
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    assert (rgb[..., 2] > 0.2).any()  # sky visible


def test_backends_agree_on_hardware(tpu):
    import jax
    import jax.numpy as jnp

    from raytracegr_jl_tpu import IntegratorConfig, RenderConfig, render_fn
    from raytracegr_jl_tpu.models.scenes import build, example2_spec
    from raytracegr_jl_tpu.render import default_tol

    dtype = jnp.float32
    spec = example2_spec(32, 32)
    metric, scene, canvas = build(spec, dtype)
    tol = default_tol(dtype)
    integ = IntegratorConfig(method="tsit5", rtol=tol, atol=tol,
                             max_steps=20_000)
    out = {}
    for be in ("pallas", "xla_cm"):
        cfg = RenderConfig(integrator=integ, backend=be)
        out[be] = np.asarray(
            jax.jit(render_fn(metric, scene, cfg))(canvas.pos, canvas.normal))
    frac_same = (np.abs(out["pallas"] - out["xla_cm"]).max(-1) < 1e-3).mean()
    assert frac_same > 0.99, f"only {frac_same:.3f} pixels agree"


def test_flagship_pallas_vs_xla_cm_200(tpu):
    """VERDICT r3 item 5: the 200x200 flagship — compiled Pallas kernel vs
    the component-major XLA driver on hardware, within 2 LSB for (nearly)
    every pixel. Step-sequence f32 roundoff between the two compilations
    may flip isolated checker-boundary pixels; the bound reflects that."""
    import jax
    import jax.numpy as jnp

    from raytracegr_jl_tpu import IntegratorConfig, RenderConfig, render_fn
    from raytracegr_jl_tpu.models.scenes import build, example2_spec
    from raytracegr_jl_tpu.render import default_tol

    dtype = jnp.float32
    spec = example2_spec(200, 200)
    metric, scene, canvas = build(spec, dtype)
    tol = default_tol(dtype)
    integ = IntegratorConfig(method="tsit5", rtol=tol, atol=tol,
                             max_steps=20_000)
    out = {}
    for be in ("pallas", "xla_cm"):
        cfg = RenderConfig(integrator=integ, backend=be)
        out[be] = np.asarray(
            jax.jit(render_fn(metric, scene, cfg))(canvas.pos,
                                                   canvas.normal))
    frac_2lsb = (np.abs(out["pallas"] - out["xla_cm"]).max(-1)
                 <= 2 / 255).mean()
    assert frac_2lsb > 0.995, f"only {frac_2lsb:.4f} pixels within 2 LSB"


def test_compaction_matches_single_launch_on_hardware(tpu):
    """Compiled (non-interpret) compaction driver vs single-launch kernel:
    the bitwise claim must survive Mosaic compilation of the resumable
    chunk kernels, not just interpret mode."""
    import jax
    import jax.numpy as jnp

    from raytracegr_jl_tpu import IntegratorConfig
    from raytracegr_jl_tpu.compaction import trace_batch_compacted
    from raytracegr_jl_tpu.models.scenes import build, example2_spec
    from raytracegr_jl_tpu.ops.pallas_geodesic import (integrate_rays_pallas,
                                                       scene_event_cm)
    from raytracegr_jl_tpu.render import _metric_cm_of, default_tol

    dtype = jnp.float32
    spec = example2_spec(48, 48)
    metric, scene, canvas = build(spec, dtype)
    y0 = jnp.concatenate([canvas.pos, canvas.normal], -1).reshape(-1, 8)
    tol = default_tol(dtype)
    cfg = IntegratorConfig(method="tsit5", rtol=tol, atol=tol,
                           max_steps=2000)
    mcm = _metric_cm_of(metric)
    ev = scene_event_cm(scene, literal=True)
    dt0 = jnp.full(y0.shape[:1], 0.01, dtype)
    a = integrate_rays_pallas(mcm, ev, y0, dt0, cfg)
    b = trace_batch_compacted(mcm, ev, y0, dt0, cfg, first_chunk=64)
    np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y))
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.steps), np.asarray(b.steps))


def test_grad_ckpt_fwd_bwd_finite_at_scale(tpu):
    """Regression for the round-4 f32 NaN at 40k-ray scale: one full
    value_and_grad train step at 200x200 through the checkpointed
    custom-VJP path must produce finite (M, a, pose) gradients on
    hardware."""
    import jax
    import jax.numpy as jnp

    from raytracegr_jl_tpu.grad import (InverseParams, default_inverse_cfg,
                                        flat_pixel_grid, make_ray_loss_fn,
                                        make_ray_render_for_params)
    from raytracegr_jl_tpu.models.scenes import example2_spec

    dtype = jnp.float32
    spec = example2_spec(200, 200)
    cfg = default_inverse_cfg(dtype, max_steps=48, method="tsit5",
                              stop_rho=0.5)._replace(backend="xla_cm")
    truth = InverseParams(M=jnp.asarray(1.0, dtype),
                          a=jnp.asarray(0.0, dtype),
                          sphere_pos=jnp.asarray([0., 4., 0., 0.], dtype))
    p = truth._replace(M=jnp.asarray(1.05, dtype))
    xg, ng = flat_pixel_grid(spec, dtype)
    render = jax.jit(make_ray_render_for_params(spec, cfg, 2, dtype))
    target = render(truth, xg, ng)
    loss = make_ray_loss_fn(spec, cfg, 2, dtype)
    l, g = jax.jit(jax.value_and_grad(loss))(p, xg, ng, target)
    assert np.isfinite(float(l))
    assert np.isfinite(float(g.M)) and np.isfinite(float(g.a))
    assert np.isfinite(np.asarray(g.sphere_pos)).all()
    assert abs(float(g.M)) > 0  # the M signal exists at this resolution
