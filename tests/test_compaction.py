"""Mid-flight compaction tests (interpret mode on CPU).

The central claim of raytracegr_jl_tpu/compaction.py is that chunked
launches + active-lane packing are invisible to the per-ray math: results
must be BITWISE identical to the single-launch fused kernel. Verified here
on a Kerr scene whose step counts genuinely diverge (hits, misses, and
multi-chunk stragglers all present), plus the renderer-level wrapper.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracegr_jl_tpu import IntegratorConfig, RenderConfig, trace_rays
from raytracegr_jl_tpu.compaction import (render_compacted,
                                          trace_batch_compacted)
from raytracegr_jl_tpu.models.scenes import build, example2_spec
from raytracegr_jl_tpu.ops.pallas_geodesic import (integrate_rays_pallas,
                                                   scene_event_cm)
from raytracegr_jl_tpu.render import _metric_cm_of


def _setup(n=48):
    spec = example2_spec(n, n)
    metric, scene, canvas = build(spec, jnp.float32)
    y0 = jnp.concatenate([canvas.pos, canvas.normal], -1).reshape(-1, 8)
    cfg = IntegratorConfig(method="tsit5", rtol=3e-6, atol=3e-6,
                           max_steps=400)
    return metric, scene, canvas, y0, cfg


class TestCompaction:
    @pytest.mark.heavy
    def test_bitwise_equals_single_launch(self):
        metric, scene, canvas, y0, cfg = _setup()
        mcm = _metric_cm_of(metric)
        ev = scene_event_cm(scene, literal=True)
        dt0 = jnp.full(y0.shape[:1], 0.01, jnp.float32)
        a = integrate_rays_pallas(mcm, ev, y0, dt0, cfg, interpret=True)
        # first_chunk=16 forces many chunk boundaries AND bucket shrinks
        b = trace_batch_compacted(mcm, ev, y0, dt0, cfg, first_chunk=16,
                                  interpret=True)
        np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y))
        np.testing.assert_array_equal(np.asarray(a.lam), np.asarray(b.lam))
        np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
        np.testing.assert_array_equal(np.asarray(a.steps),
                                      np.asarray(b.steps))

    @pytest.mark.heavy
    def test_render_compacted_matches_backend_pallas(self):
        metric, scene, canvas, y0, cfg = _setup(32)
        rc = RenderConfig(integrator=cfg, backend="pallas",
                          pallas_interpret=True)
        rgb_p = np.asarray(trace_rays(metric, scene, canvas, rc).rgb)
        out = render_compacted(metric, scene, canvas, rc, first_chunk=32,
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(out.rgb), rgb_p)

    @pytest.mark.heavy
    def test_fast_epilogue_close(self):
        """fast_epilogue jits the init-dt + shading epilogue: no bitwise
        pin (fusion rounding can ulp-shift dt0, and the controller may
        amplify that into a different valid step sequence for isolated
        grazing rays), but the image must stay visually identical — the
        overwhelming majority of pixels bitwise equal, any stragglers
        confined to silhouette flips."""
        metric, scene, canvas, y0, cfg = _setup(32)
        rc = RenderConfig(integrator=cfg, backend="pallas",
                          pallas_interpret=True)
        ref = np.asarray(render_compacted(metric, scene, canvas, rc,
                                          first_chunk=32,
                                          interpret=True).rgb)
        fast = np.asarray(render_compacted(metric, scene, canvas, rc,
                                           first_chunk=32, interpret=True,
                                           fast_epilogue=True).rgb)
        pixel_differs = np.any(np.abs(fast - ref) > 1e-6, axis=-1)
        frac = pixel_differs.mean()
        assert frac < 0.02, (
            f"{pixel_differs.sum()} of {pixel_differs.size} pixels differ "
            f"({frac:.1%}) between fast_epilogue and the parity epilogue")

    @pytest.mark.heavy
    def test_max_steps_budget_respected(self):
        """Total iterations across chunks cap at cfg.max_steps: rays that
        would need more stay un-hit, exactly like the single launch."""
        metric, scene, canvas, y0, cfg = _setup()
        cfg = cfg._replace(max_steps=24)
        mcm = _metric_cm_of(metric)
        ev = scene_event_cm(scene, literal=True)
        dt0 = jnp.full(y0.shape[:1], 0.01, jnp.float32)
        a = integrate_rays_pallas(mcm, ev, y0, dt0, cfg, interpret=True)
        b = trace_batch_compacted(mcm, ev, y0, dt0, cfg, first_chunk=16,
                                  interpret=True)
        np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
        np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y))
