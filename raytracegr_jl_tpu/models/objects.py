"""Scene objects as pytrees (struct-of-arrays), TPU-native.

The reference models objects with an abstract OO protocol (``Object{T}`` with
``distance``/``objcolor`` dispatch, /root/reference/src/RayTraceGR.jl:374-441).
Dynamic dispatch over a heterogeneous list is hostile to XLA, so here a scene
is ONE fixed-shape struct-of-arrays over all objects with an integer ``kind``
tag; distance/color are computed for every object with ``jnp.where`` selection.
Object counts are tiny (3 in the examples), so the dense evaluation is free,
stays fully vectorized over rays, and keeps shapes static under jit.

Object semantics reproduced exactly (parity-critical quirks included):
  * ``Sphere`` distance is the QUADRATIC form
    ``sign(radius) * (|pos_spatial - center|^2 - radius^2)`` — not Euclidean
    distance — and a negative radius flips the sign, turning the sphere
    inside-out (the "caelum" sky sphere). Reference: RayTraceGR.jl:415-419.
  * Sphere color is a 12x12 checkered lat/long pattern from the spherical
    angles of the hit point. Reference: RayTraceGR.jl:420-428.
  * ``Plane`` is a time-plane: ``distance = t - time``, constant green
    (0, 1/2, 0). Reference: RayTraceGR.jl:393-404.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import D

KIND_SPHERE = 0
KIND_PLANE = 1
KIND_DISK = 2


class Sphere(NamedTuple):
    """Sphere object (reference: RayTraceGR.jl:408-428).

    ``vel`` is stored but unused by distance/color, matching the reference
    (``# TODO: Use metric?`` at RayTraceGR.jl:416).
    """

    pos: Sequence[float]  # center x^a, length 4
    vel: Sequence[float]  # 4-velocity, length 4 (unused, kept for parity)
    radius: float  # negative => inside-out sky sphere


class Plane(NamedTuple):
    """Time-plane object (reference: RayTraceGR.jl:393-404)."""

    time: float


class Disk(NamedTuple):
    """Equatorial accretion disk: an annulus ``r_in <= rho <= r_out`` of
    half-thickness ``half`` in the z = pos[3] plane (BASELINE.json config 4).

    Beyond the reference: its object protocol (RayTraceGR.jl:374-389) defines
    the signed-distance contract this satisfies, and its ``Sphere.vel`` +
    ``# TODO: Use metric?`` (RayTraceGR.jl:416) is the metric-aware-shading
    hook this realizes — disk matter moves on circular Keplerian orbits about
    the z-axis and is shaded by its gravitational+Doppler g-factor
    (models/shading.py). Center the disk on the black hole for the orbit
    physics to make sense; keep ``r_in`` at/above the ISCO.
    """

    pos: Sequence[float]  # center x^a, length 4 (put it at the hole)
    r_in: float  # inner radius (>= ISCO for physical orbits)
    r_out: float  # outer radius
    half: float = 0.02  # half-thickness in z


class Scene(NamedTuple):
    """Struct-of-arrays over N objects; a jit-friendly pytree.

    Index order is the user's object list order — it matters for shading:
    the reference dims hit colors by ``(index+1)/N`` (RayTraceGR.jl:530) and
    breaks distance ties by earliest index (RayTraceGR.jl:520-526).
    """

    kind: jax.Array  # [N] int32, KIND_SPHERE / KIND_PLANE / KIND_DISK
    pos: jax.Array  # [N, 4] sphere/disk centers (zeros for planes)
    vel: jax.Array  # [N, 4] emitter 4-velocities (redshift shading)
    radius: jax.Array  # [N] sphere radii (1 for planes/disks, avoids 0-div)
    time: jax.Array  # [N] plane times (0 for spheres/disks)
    r_in: jax.Array  # [N] disk inner radii (0 otherwise)
    r_out: jax.Array  # [N] disk outer radii (1 otherwise)
    half: jax.Array  # [N] disk half-thicknesses (1 otherwise)

    @property
    def n_objects(self) -> int:
        return self.kind.shape[0]


def make_scene(objects: Sequence[Sphere | Plane | Disk],
               dtype=jnp.float64) -> Scene:
    """Pack a heterogeneous object list into a Scene pytree."""
    kind, pos, vel, radius, time = [], [], [], [], []
    r_in, r_out, half = [], [], []
    for obj in objects:
        if isinstance(obj, Sphere):
            kind.append(KIND_SPHERE)
            pos.append(list(obj.pos))
            vel.append(list(obj.vel))
            radius.append(obj.radius)
            time.append(0.0)
            r_in.append(0.0), r_out.append(1.0), half.append(1.0)
        elif isinstance(obj, Plane):
            kind.append(KIND_PLANE)
            pos.append([0.0] * D)
            vel.append([0.0] * D)
            radius.append(1.0)
            time.append(obj.time)
            r_in.append(0.0), r_out.append(1.0), half.append(1.0)
        elif isinstance(obj, Disk):
            kind.append(KIND_DISK)
            pos.append(list(obj.pos))
            vel.append([1.0, 0.0, 0.0, 0.0])  # overridden by Keplerian flow
            radius.append(1.0)
            time.append(0.0)
            r_in.append(obj.r_in), r_out.append(obj.r_out), half.append(obj.half)
        else:
            raise TypeError(f"unknown object type: {type(obj)!r}")
    return Scene(
        kind=jnp.asarray(kind, jnp.int32),
        pos=jnp.asarray(pos, dtype),
        vel=jnp.asarray(vel, dtype),
        radius=jnp.asarray(radius, dtype),
        time=jnp.asarray(time, dtype),
        r_in=jnp.asarray(r_in, dtype),
        r_out=jnp.asarray(r_out, dtype),
        half=jnp.asarray(half, dtype),
    )


# ---------------------------------------------------------------------------
# Per-kind signed-distance definitions — THE single source of truth.
#
# Every execution style derives from these: the vectorized row-major
# ``distances`` below (get returns [N]-broadcast scene arrays), the
# component-major event function (ops/pallas_geodesic.scene_event_cm; get
# returns one object's traced scalar), and the Pallas in-kernel literal
# variant (get returns a python float baked at trace time). Adding an
# object kind means writing ONE function here and registering it — all
# backends pick it up (tests/test_objects.py::test_register_new_kind).
#
# Contract (reference docstring, RayTraceGR.jl:377-383): zero on the
# surface, positive outside, negative inside. ``t, x, y, z`` are coordinate
# components of any broadcast-compatible shape; ``get(field, comp=None)``
# returns the object parameter(s) in matching form.
# ---------------------------------------------------------------------------

def _sphere_distance(t, x, y, z, get):
    """Quadratic sphere distance with the sign(radius) inside-out flip
    (reference quirk, RayTraceGR.jl:415-419)."""
    dx = x - get("pos", 1)
    dy = y - get("pos", 2)
    dz = z - get("pos", 3)
    r = get("radius")
    # Literal radius (Pallas baking): fold the sign to a python float at
    # trace time — jnp.sign on a python scalar materializes an f64 under
    # x64, which Mosaic rejects inside the kernel.
    sgn = ((1.0 if r >= 0 else -1.0) if isinstance(r, float)
           else jnp.sign(r))
    return sgn * (dx * dx + dy * dy + dz * dz - r * r)


def _plane_distance(t, x, y, z, get):
    """Time-plane: d = t - time (reference: RayTraceGR.jl:399-401)."""
    return t - get("time")


def _disk_distance(t, x, y, z, get):
    """Equatorial annulus: slab /\\ quadratic ring (beyond-reference kind;
    same quadratic-form convention as the Sphere quirk). max() of the three
    signed constraints is < 0 exactly inside the disk volume."""
    dx = x - get("pos", 1)
    dy = y - get("pos", 2)
    dz = z - get("pos", 3)
    rho2 = dx * dx + dy * dy
    return jnp.maximum(jnp.abs(dz) - get("half"),
                       jnp.maximum(rho2 - get("r_out") ** 2,
                                   get("r_in") ** 2 - rho2))


KIND_DISTANCE = {
    KIND_SPHERE: _sphere_distance,
    KIND_PLANE: _plane_distance,
    KIND_DISK: _disk_distance,
}


def register_kind(kind_id: int, distance_fn) -> None:
    """Register a new object kind's signed-distance function (see the
    KIND_DISTANCE block comment). The Scene must encode its parameters in
    the existing fields (pos/radius/time/r_in/r_out/half)."""
    KIND_DISTANCE[kind_id] = distance_fn


def distances(scene: Scene, x: jax.Array) -> jax.Array:
    """Signed distance of point(s) to EVERY object: ``[..., 4] -> [..., N]``.

    Evaluates every registered kind's definition vectorized over the object
    axis and selects by the kind tag (object counts are tiny, so dense
    evaluation is free and keeps shapes static under jit).
    """
    t = x[..., None, 0]
    xs, ys, zs = x[..., None, 1], x[..., None, 2], x[..., None, 3]

    def get(field, comp=None):
        arr = getattr(scene, field)
        return arr[..., :, comp] if comp is not None else arr

    d = None
    for kid in sorted(KIND_DISTANCE):
        dk = KIND_DISTANCE[kid](t, xs, ys, zs, get)
        d = dk if d is None else jnp.where(scene.kind == kid, dk, d)
    return d


def min_distance(scene: Scene, s: jax.Array) -> jax.Array:
    """Min over objects of distance to the ray position; the event function
    for ray termination. ``s`` is flat ray state ``[..., 8]``
    (reference: RayTraceGR.jl:432-441)."""
    return jnp.min(distances(scene, s[..., :D]), axis=-1)


def colors(scene: Scene, x: jax.Array, smooth: bool = False,
           freq: float = 12.0) -> jax.Array:
    """RGB color of EVERY object at point(s) x: ``[..., 4] -> [..., N, 3]``.

    Sphere: 12x12 checkered lat/long from spherical angles of the hit point
    (RayTraceGR.jl:420-428). Plane: constant (0, 1/2, 0) (RayTraceGR.jl:402-404).

    ``smooth=True`` replaces the sawtooth checker ``mod(t, 1)`` (which jumps
    0<->1 at every cell boundary — fine for display, hostile to gradient
    descent) with the same-period smooth wave ``(1-cos(2 pi t))/2`` for
    inverse rendering.

    ``freq`` scales the sphere checker frequency (reference value 12).
    Inverse rendering wants it LOW: the attraction basin of a texture-based
    loss in a parameter p is |dp| < period / (texture slide rate dx_hit/dp);
    under lensing dx_hit/dM is amplified ~(4/b) x path length, so the
    12-cell checker aliases outside |dM| ~ 1%-2% while freq=2 widens the
    basin ~6x (see scenes.lensing_inverse_spec).
    """
    rel = x[..., None, 1:] - scene.pos[..., :, 1:]  # [..., N, 3]
    xx, yy, zz = rel[..., 0], rel[..., 1], rel[..., 2]
    r = jnp.sqrt(xx * xx + yy * yy + zz * zz)
    # Guard r=0 (ray exactly at a center never happens on hits; avoids NaN grads)
    theta = jnp.arccos(jnp.clip(zz / jnp.where(r == 0, 1.0, r), -1.0, 1.0))
    phi = jnp.arctan2(yy, xx)
    if smooth:
        wave = lambda t: 0.5 - 0.5 * jnp.cos(2 * jnp.pi * t)
    else:
        wave = lambda t: jnp.mod(t, 1.0)
    sphere_rgb = jnp.stack(
        [
            wave(freq * theta / jnp.pi),
            wave(freq * phi / jnp.pi),
            jnp.ones_like(r),
        ],
        axis=-1,
    )  # [..., N, 3]
    plane_rgb = jnp.stack(
        [jnp.zeros_like(r), jnp.full_like(r, 0.5), jnp.zeros_like(r)], axis=-1
    )
    # Disk base pattern: radial rings x azimuthal checker (the redshift
    # shading in models/shading.py modulates this by the g-factor).
    rho_cyl = jnp.sqrt(xx * xx + yy * yy)
    disk_rgb = jnp.stack(
        [wave(rho_cyl), wave(6 * phi / jnp.pi), jnp.full_like(r, 0.9)],
        axis=-1)
    return jnp.where((scene.kind == KIND_SPHERE)[..., None], sphere_rgb,
                     jnp.where((scene.kind == KIND_PLANE)[..., None],
                               plane_rgb, disk_rgb))


def shade(scene: Scene, x: jax.Array, hit_dmin: float = 0.01) -> jax.Array:
    """Shading pass: final ray position(s) -> RGB, reproducing
    RayTraceGR.jl:513-535 exactly.

    Scan objects keeping the smallest distance strictly below ``hit_dmin``
    (earliest index wins exact ties); miss => red (1,0,0); hit => object color
    dimmed by ``(index+1)/N`` (the reference's object-index brightness quirk).
    """
    d = distances(scene, x)  # [..., N]
    n = scene.n_objects
    hit_any = jnp.min(d, axis=-1) < hit_dmin
    omin = jnp.argmin(d, axis=-1)  # first index on ties, like the < scan
    col = jnp.take_along_axis(colors(scene, x), omin[..., None, None], axis=-2)
    col = jnp.squeeze(col, axis=-2)  # [..., 3]
    dim = (omin.astype(col.dtype) + 1) / n
    col = col * dim[..., None]
    miss = jnp.array([1.0, 0.0, 0.0], col.dtype)
    return jnp.where(hit_any[..., None], col, miss)


def shade_lanes(scene: Scene, x: jax.Array, hit_dmin: float = 0.01) -> jax.Array:
    """``shade`` restructured for TPU lane density: bitwise-identical values,
    radically better layouts under AD.

    ``shade`` materializes ``[B, N, 3]`` intermediates (distances via
    broadcasting, colors for every object, a take_along_axis select). On
    TPU those buffers get the (8, 128) tile on the two MINOR dims — with
    N = 3 objects the 3-wide minor axis pads to 128 lanes, so each logical
    1.4 MB buffer occupies ~61 MB of HBM at 2.3%% utilization. The forward
    pass fuses it away, but the VJP's scatter-add (transpose of
    take_along_axis) and jvp residuals FORCE materialization — measured
    ~4 ms of a 9 ms fwd+bwd training step at 200x200 (round-5 profile).

    This version runs the SAME per-pixel scalar chains (same ops, same
    order — so every element is bitwise equal to ``shade``'s) but as
    per-object, per-channel ``[B]`` arrays: the batch axis stays minor,
    every buffer is lane-dense, and the select is a where-chain whose
    transpose is also lane-dense. N is tiny (3 for the reference scenes),
    so the Python loop over objects just unrolls.

    Reference semantics reproduced (RayTraceGR.jl:513-535): smallest
    distance strictly below ``hit_dmin`` wins, earliest index on exact
    ties, miss => red, hit => objcolor * (index+1)/N.
    """
    n = scene.n_objects
    t = x[..., 0]
    xs, ys, zs = x[..., 1], x[..., 2], x[..., 3]
    kinds = [int(k) for k in np.asarray(scene.kind)]

    def get_i(i):
        def get(field, comp=None):
            arr = getattr(scene, field)
            return arr[i, comp] if comp is not None else arr[i]
        return get

    d_list = [KIND_DISTANCE[kinds[i]](t, xs, ys, zs, get_i(i))
              for i in range(n)]
    d_best = d_list[0]
    omin = jnp.zeros_like(t, dtype=jnp.int32)
    for i in range(1, n):
        better = d_list[i] < d_best  # strict: earliest index wins ties
        d_best = jnp.where(better, d_list[i], d_best)
        omin = jnp.where(better, i, omin)
    hit_any = d_best < hit_dmin

    freq = 12.0
    rgb = [jnp.zeros_like(t), jnp.zeros_like(t), jnp.zeros_like(t)]
    for i in range(n):
        sel = omin == i
        # Same scalar chain as colors() so values match it bitwise.
        xx = xs - scene.pos[i, 1]
        yy = ys - scene.pos[i, 2]
        zz = zs - scene.pos[i, 3]
        r = jnp.sqrt(xx * xx + yy * yy + zz * zz)
        theta = jnp.arccos(jnp.clip(zz / jnp.where(r == 0, 1.0, r),
                                    -1.0, 1.0))
        phi = jnp.arctan2(yy, xx)
        if kinds[i] == KIND_SPHERE:
            col = [jnp.mod(freq * theta / jnp.pi, 1.0),
                   jnp.mod(freq * phi / jnp.pi, 1.0),
                   jnp.ones_like(r)]
        elif kinds[i] == KIND_PLANE:
            col = [jnp.zeros_like(r), jnp.full_like(r, 0.5),
                   jnp.zeros_like(r)]
        else:  # KIND_DISK base pattern (see colors())
            rho_cyl = jnp.sqrt(xx * xx + yy * yy)
            col = [jnp.mod(rho_cyl, 1.0), jnp.mod(6 * phi / jnp.pi, 1.0),
                   jnp.full_like(r, 0.9)]
        dim = jnp.asarray((i + 1) / n, t.dtype)
        for ch in range(3):
            rgb[ch] = jnp.where(sel, col[ch] * dim, rgb[ch])
    miss = (jnp.ones_like(t), jnp.zeros_like(t), jnp.zeros_like(t))
    out = [jnp.where(hit_any, rgb[ch], miss[ch]) for ch in range(3)]
    return jnp.stack(out, axis=-1)


def shade_soft(scene: Scene, x: jax.Array, hit_dmin: float = 0.01,
               temp: float = 0.05, smooth_colors: bool = True,
               color_freq: float = 12.0) -> jax.Array:
    """Differentiable shading: smooth relaxation of ``shade``.

    The reference's shading (argmin object + hard distance threshold,
    RayTraceGR.jl:513-535) is piecewise constant, so pixel losses carry no
    gradient through the hit/miss and which-object decisions — only through
    the hit position. For inverse rendering this replaces both
    discontinuities with temperature-controlled soft versions:

      * object selection: softmin over distances (softmax of -d/temp),
      * hit decision: sigmoid((hit_dmin - softmin_d)/temp),

    recovering ``shade`` exactly as temp -> 0. This is a framework
    capability beyond the reference (its forward-only AD cannot use it).
    """
    d = distances(scene, x)  # [..., N]
    n = scene.n_objects
    w = jax.nn.softmax(-d / temp, axis=-1)  # [..., N] object weights
    dim = (jnp.arange(n, dtype=d.dtype) + 1) / n
    col = colors(scene, x, smooth=smooth_colors,
                 freq=color_freq) * dim[..., :, None]
    obj_col = jnp.einsum("...n,...nc->...c", w, col)
    softmin_d = -temp * jax.nn.logsumexp(-d / temp, axis=-1)
    p_hit = jax.nn.sigmoid((hit_dmin - softmin_d) / temp)
    miss = jnp.array([1.0, 0.0, 0.0], col.dtype)
    return p_hit[..., None] * obj_col + (1 - p_hit[..., None]) * miss
