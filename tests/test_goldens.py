"""Regression against THIS framework's own committed golden renders.

The reference commits its renders (/root/reference/scenes/sphere.png,
sphere2.png) as de-facto integration tests; parity against those lives in
benchmarks/parity.py and tests/test_render.py. This file guards OUR outputs
across rounds: 64x64 f64 renders at a pinned (cheap) config, regenerated in
the default suite and compared to scenes/golden64_e1.png / golden64_e2.png.

Tolerance: <= 2 LSB on >= 99.5% of pixels — renders are deterministic on one
machine, but silhouette/checker-boundary pixels may flip across BLAS/XLA
versions (see benchmarks/parity.py's grazing analysis).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracegr_jl_tpu import IntegratorConfig, RenderConfig
from raytracegr_jl_tpu.models.scenes import (example1_spec, example2_spec,
                                             render_spec)
from raytracegr_jl_tpu.utils.image import canvas_to_image, load_png

# Must match the generator config baked into the committed goldens.
GOLDEN_CFG = RenderConfig(integrator=IntegratorConfig(
    method="tsit5", rtol=1e-10, atol=1e-10, max_steps=4000))


@pytest.mark.parametrize("name,spec_fn", [
    ("golden64_e1", example1_spec),
    # Kerr-Schild at f64 golden tolerance is ~24 s CPU: heavy tier (CI
    # runs it every push; example1 keeps golden coverage in the default).
    pytest.param("golden64_e2", example2_spec, marks=pytest.mark.heavy),
])
def test_own_golden_regression(name, spec_fn):
    canvas = render_spec(spec_fn(64, 64), jnp.float64, GOLDEN_CFG)
    img = canvas_to_image(np.asarray(canvas.rgb)).astype(np.float64) / 255.0
    gold = load_png(f"scenes/{name}.png")
    assert img.shape == gold.shape
    frac_bad = float((np.abs(img - gold).max(-1) > 2 / 255).mean())
    assert frac_bad <= 0.005, f"{name}: {frac_bad:.4%} pixels drifted"
