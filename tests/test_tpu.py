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
