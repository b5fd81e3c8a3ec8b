"""Camera tests: null-ray construction, curved-screen offsets, FOV
(/root/reference/src/RayTraceGR.jl:445-478)."""

import jax.numpy as jnp
import numpy as np

from raytracegr_jl_tpu import (KerrSchildParams, make_canvas, make_metric,
                               minkowski)


class TestMakeCanvas:
    def test_shapes(self):
        c = make_canvas(minkowski, (0, 0, -2, 0), (0, 1, 0, 0), (0, 0, 0, 1),
                        (0, 0, 1, 0), 8, 16)
        assert c.pos.shape == (8, 16, 4)
        assert c.normal.shape == (8, 16, 4)
        assert c.rgb.shape == (8, 16, 3)

    def test_rays_are_null(self):
        """u = (t_hat + n_hat)/sqrt(2) is null by construction
        (RayTraceGR.jl:469-474) — in any metric."""
        for name, p in (("minkowski", None),
                        ("kerr_schild", KerrSchildParams(1.0, 0.0))):
            metric = make_metric(name, p)
            c = make_canvas(metric, (0, 4, -2, 0), (0, 1, 0, 0), (0, 0, 0, 1),
                            (0, 0, 1, 0), 4, 4)
            g = metric(c.pos)
            n2 = jnp.einsum("...a,...ab,...b->...", c.normal, g, c.normal)
            np.testing.assert_allclose(np.asarray(n2), 0.0, atol=1e-12)

    def test_rays_past_pointing(self):
        """t component of u is negative: past-directed (g^tt < 0 raises
        (1,0,0,0) to a past-pointing vector)."""
        c = make_canvas(minkowski, (0, 0, -2, 0), (0, 1, 0, 0), (0, 0, 0, 1),
                        (0, 0, 1, 0), 4, 4)
        assert bool(jnp.all(c.normal[..., 0] < 0))

    def test_pixel_offsets_match_reference(self):
        """Center pixel of odd grid sits exactly at pos; offsets span
        (-1/2, 1/2) exclusive (RayTraceGR.jl:465-466)."""
        ni = nj = 5
        c = make_canvas(minkowski, (0, 0, -2, 0), (0, 1, 0, 0), (0, 0, 0, 1),
                        (0, 0, 1, 0), ni, nj)
        np.testing.assert_allclose(np.asarray(c.pos[2, 2]),
                                   [0.0, 0.0, -2.0, 0.0], atol=1e-15)
        # First pixel: dx = dy = 0.5/5 - 0.5 = -0.4
        np.testing.assert_allclose(np.asarray(c.pos[0, 0]),
                                   [0.0, -0.4, -2.0, -0.4], atol=1e-15)

    def test_curved_screen_tilts_normals(self):
        """The same pixel offset is added to the normal -> corner rays
        diverge (90 deg FOV geometry, RayTraceGR.jl:467-468)."""
        c = make_canvas(minkowski, (0, 0, -2, 0), (0, 1, 0, 0), (0, 0, 0, 1),
                        (0, 0, 1, 0), 3, 3)
        center = np.asarray(c.normal[1, 1])
        corner = np.asarray(c.normal[0, 0])
        # spatial directions differ
        assert not np.allclose(center[1:], corner[1:])
        # center ray points straight along +y (normal axis)
        assert center[2] > 0 and abs(center[1]) < 1e-14 and abs(center[3]) < 1e-14
