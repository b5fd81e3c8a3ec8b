"""Scene-object tests: the quadratic sphere distance, inside-out sky sphere,
time-plane, checker colors, and the reference's shading quirks
(/root/reference/src/RayTraceGR.jl:374-441, 513-535)."""

import jax.numpy as jnp
import numpy as np

from raytracegr_jl_tpu import Plane, Sphere, make_scene, min_distance, shade
from raytracegr_jl_tpu.models.objects import colors, distances


def example_scene():
    return make_scene([
        Sphere(pos=(0, 0, 0, 0), vel=(1, 0, 0, 0), radius=-10.0),  # caelum
        Plane(time=-20.0),                                          # frustum
        Sphere(pos=(0, 0, 0, 0), vel=(1, 0, 0, 0), radius=0.5),    # sphere
    ])


class TestDistance:
    def test_sphere_quadratic_form(self):
        """distance = sign(r)*(|dx|^2 - r^2), NOT Euclidean
        (RayTraceGR.jl:415-419)."""
        sc = make_scene([Sphere(pos=(0, 1, 0, 0), vel=(1, 0, 0, 0),
                                radius=0.5)])
        x = jnp.array([0.0, 3.0, 0.0, 0.0])  # |dx| = 2
        d = distances(sc, x)
        np.testing.assert_allclose(float(d[0]), 4.0 - 0.25, rtol=1e-14)

    def test_negative_radius_flips_sign(self):
        """caelum: r=-10 => inside (|dx|<10) is POSITIVE (sky not yet hit)."""
        sc = make_scene([Sphere(pos=(0, 0, 0, 0), vel=(1, 0, 0, 0),
                                radius=-10.0)])
        inside = jnp.array([0.0, 1.0, 0.0, 0.0])
        outside = jnp.array([0.0, 11.0, 0.0, 0.0])
        assert float(distances(sc, inside)[0]) > 0
        assert float(distances(sc, outside)[0]) < 0

    def test_plane_time_distance(self):
        """Plane: distance = t - time (RayTraceGR.jl:399-401)."""
        sc = make_scene([Plane(time=-20.0)])
        x = jnp.array([-5.0, 1.0, 2.0, 3.0])
        np.testing.assert_allclose(float(distances(sc, x)[0]), 15.0)

    def test_min_distance_over_objects(self):
        sc = example_scene()
        s = jnp.zeros(8).at[1].set(0.6)  # just outside the small sphere
        d = float(min_distance(sc, s))
        np.testing.assert_allclose(d, 0.36 - 0.25, rtol=1e-12)

    def test_batched(self):
        sc = example_scene()
        xs = jnp.array([[0.0, 0.6, 0, 0], [0.0, 3.0, 0, 0]])
        d = distances(sc, xs)
        assert d.shape == (2, 3)


class TestColors:
    def test_plane_green(self):
        sc = make_scene([Plane(time=-20.0)])
        c = colors(sc, jnp.array([0.0, 1.0, 2.0, 3.0]))
        np.testing.assert_allclose(np.asarray(c[0]), [0.0, 0.5, 0.0])

    def test_sphere_checker(self):
        """Spherical angles -> 12x12 checker (RayTraceGR.jl:420-428)."""
        sc = make_scene([Sphere(pos=(0, 0, 0, 0), vel=(1, 0, 0, 0),
                                radius=1.0)])
        x = jnp.array([0.0, 1.0, 0.0, 0.0])  # theta=pi/2, phi=0
        c = np.asarray(colors(sc, x)[0])
        np.testing.assert_allclose(c, [np.mod(12 * 0.5, 1.0), 0.0, 1.0],
                                   atol=1e-12)


class TestShade:
    def test_miss_is_red(self):
        sc = example_scene()
        x = jnp.array([0.0, 5.0, 0.0, 0.0])  # inside caelum, away from all
        np.testing.assert_allclose(np.asarray(shade(sc, x)), [1.0, 0.0, 0.0])

    def test_hit_dims_by_object_index(self):
        """Hit color scaled by (index+1)/N (RayTraceGR.jl:530): the caelum
        (object 1 of 3) is dimmed to 1/3."""
        sc = example_scene()
        x = jnp.array([0.0, 10.0, 0.001, 0.001])  # on the caelum surface
        rgb = np.asarray(shade(sc, x))
        assert rgb[2] == (1 / 3) * 1.0  # blue channel = 1 * 1/3

    def test_third_object_full_brightness(self):
        sc = example_scene()
        x = jnp.array([0.0, 0.5, 0.0, 0.0])  # on the small sphere surface
        rgb = np.asarray(shade(sc, x))
        assert rgb[2] == 1.0  # index 3 of 3 => dim factor 1

    def test_hit_threshold(self):
        """Hits require distance < 0.01 (RayTraceGR.jl:519)."""
        sc = make_scene([Sphere(pos=(0, 0, 0, 0), vel=(1, 0, 0, 0),
                                radius=1.0)])
        near = jnp.array([0.0, 1.004, 0.0, 0.0])  # d = 1.004^2-1 ~ 0.008
        far = jnp.array([0.0, 1.01, 0.0, 0.0])    # d ~ 0.02 > 0.01
        assert not np.allclose(np.asarray(shade(sc, near)), [1, 0, 0])
        np.testing.assert_allclose(np.asarray(shade(sc, far)), [1, 0, 0])


class TestKindRegistry:
    """VERDICT r3 item 3: one per-kind definition drives every backend."""

    def test_register_new_kind_all_backends_agree(self):
        from raytracegr_jl_tpu.models.objects import (KIND_DISTANCE, Scene,
                                                      distances,
                                                      register_kind)
        from raytracegr_jl_tpu.ops.pallas_geodesic import scene_event_cm

        KIND_SLAB = 77

        def slab_distance(t, x, y, z, get):
            return jnp.abs(z - get("pos", 3)) - get("half")

        register_kind(KIND_SLAB, slab_distance)
        try:
            scene = Scene(
                kind=jnp.asarray([0, KIND_SLAB], jnp.int32),  # sphere + slab
                pos=jnp.asarray([[0., 0., 0., 0.], [0., 0., 0., -1.5]]),
                vel=jnp.zeros((2, 4)),
                radius=jnp.asarray([-10.0, 1.0]),
                time=jnp.zeros(2),
                r_in=jnp.zeros(2),
                r_out=jnp.ones(2),
                half=jnp.asarray([1.0, 0.25]),
            )
            pts = jnp.asarray(
                np.random.default_rng(0).normal(size=(64, 4)) * 3)
            d_rm = np.asarray(distances(scene, pts))  # [64, 2]
            # analytic slab check
            np.testing.assert_allclose(
                d_rm[:, 1],
                np.abs(np.asarray(pts)[:, 3] + 1.5) - 0.25, rtol=1e-12)
            # component-major event (min over objects), traced and literal
            y_cm = jnp.concatenate([pts.T[:, None, :],
                                    jnp.zeros_like(pts.T)[:, None, :]], 0)
            for lit in (False, True):
                ev = scene_event_cm(scene, literal=lit)
                d_cm = np.asarray(ev(y_cm))[0]  # [64]
                np.testing.assert_array_equal(d_cm, d_rm.min(-1))
        finally:
            KIND_DISTANCE.pop(KIND_SLAB, None)


class TestShadeLanes:
    def test_bitwise_equal_to_shade(self):
        """shade_lanes is the lane-dense restructure of shade (round-5
        fwd+bwd perf work): same per-pixel scalar chains => BITWISE equal
        output on a batch covering hits of every object, ties, and misses."""
        from raytracegr_jl_tpu.models.objects import Disk, shade_lanes

        rng = np.random.default_rng(0)
        sc = example_scene()
        x = jnp.asarray(rng.uniform(-12, 12, size=(4096, 4)))
        a = shade(sc, x)
        b = shade_lanes(sc, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # on-surface points (sphere hits with checker texture)
        pts = rng.normal(size=(512, 3))
        pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
        xs = jnp.asarray(np.concatenate(
            [np.zeros((512, 1)), 0.5 * pts], axis=-1))
        np.testing.assert_array_equal(np.asarray(shade(sc, xs)),
                                      np.asarray(shade_lanes(sc, xs)))
        # disk kind too
        sc2 = make_scene([Disk(pos=(0, 0, 0, 0), r_in=3.0, r_out=8.0),
                          Plane(time=-20.0)])
        xd = jnp.asarray(rng.uniform(-10, 10, size=(2048, 4)))
        np.testing.assert_array_equal(np.asarray(shade(sc2, xd)),
                                      np.asarray(shade_lanes(sc2, xd)))

    def test_grad_matches_shade(self):
        """Parameter gradients through the two shadings agree (sphere pose
        enters via the checker angles)."""
        import jax
        from raytracegr_jl_tpu.models.objects import Scene, shade_lanes

        sc = example_scene()
        x = jnp.asarray([[0.0, 0.05, 0.49, 0.02],
                         [0.0, -0.2, 0.4, 0.1]])

        def loss_of(fn):
            def loss(pos2):
                s = sc._replace(pos=sc.pos.at[2].set(pos2))
                return jnp.sum(fn(s, x) ** 2)
            return loss

        g1 = jax.grad(loss_of(shade))(sc.pos[2])
        from raytracegr_jl_tpu.models.objects import shade_lanes as sl
        g2 = jax.grad(loss_of(sl))(sc.pos[2])
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-12, atol=0)
