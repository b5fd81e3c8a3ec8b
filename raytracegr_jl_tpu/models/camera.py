"""Camera / canvas construction, vectorized.

Replaces the reference's serial per-pixel double loop
(/root/reference/src/RayTraceGR.jl:445-478) with one vmapped array program
over the pixel grid — a single fused XLA kernel instead of ni*nj metric calls.

Parity-critical camera semantics reproduced exactly:
  * pixel offsets ``dx = (i+1/2)/ni - 1/2`` in (-1/2, 1/2) (0-based i here;
    the reference's 1-based ``(i-1/2)/ni - 1/2`` is identical),
  * the SAME offsets tilt the normal -> curved screen, 90 deg FOV when
    |widthx| = |widthy| = |normal| (RayTraceGR.jl:467-468, README.md:98),
  * metric-correct null ray 4-velocity: raise (1,0,0,0) with g^{-1}
    (past-pointing for g_tt < 0), normalize t by sqrt(-t.g.t) and n by
    sqrt(n.g.n), then u = (t_hat + n_hat)/sqrt(2) — null by construction
    (RayTraceGR.jl:469-474).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.geometry import MetricFn, inv4
from ..ops.metrics import D


class Canvas(NamedTuple):
    """Pixel grid as a pytree of arrays (reference Pixel/Canvas structs,
    RayTraceGR.jl:445-455). ``pos``/``normal`` are [ni, nj, 4]; ``rgb`` is
    [ni, nj, 3] (filled by the render driver)."""

    pos: jax.Array
    normal: jax.Array
    rgb: jax.Array

    @property
    def shape(self):
        return self.pos.shape[:-1]


def pixel_rays(
    metric: MetricFn, pos: jax.Array, normal: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Null 4-velocity for pixel(s): positions [..., 4], tilted normals
    [..., 4] -> (pos, u) with u past-pointing null (RayTraceGR.jl:469-474)."""
    g = metric(pos)  # [..., 4, 4]
    gu = inv4(g)
    t = gu[..., :, 0]  # g^{-1} . (1,0,0,0)
    t2 = jnp.einsum("...a,...ab,...b->...", t, g, t)
    n2 = jnp.einsum("...a,...ab,...b->...", normal, g, normal)
    that = t / jnp.sqrt(-t2)[..., None]
    nhat = normal / jnp.sqrt(n2)[..., None]
    u = (that + nhat) / jnp.sqrt(jnp.asarray(2.0, pos.dtype))
    return pos, u


def pixel_grid(
    pos,
    widthx,
    widthy,
    normal,
    ni: int,
    nj: int,
    dtype=None,
) -> tuple[jax.Array, jax.Array]:
    """The parameter-INDEPENDENT half of the camera: pixel positions and
    tilted (pre-normalization) normals, both [ni, nj, 4].

    Splitting this from ``pixel_rays`` (the metric-dependent null-velocity
    construction, RayTraceGR.jl:469-474) lets the pixel batch enter a jitted
    program as sharded DATA arguments — the precondition for GSPMD actually
    partitioning a sharded render/inversion step (see parallel/sharding.py) —
    while (M, a) gradients still flow through the normalization applied
    inside the traced function.
    """
    pos = jnp.asarray(pos, dtype)
    dtype = pos.dtype
    widthx = jnp.asarray(widthx, dtype)
    widthy = jnp.asarray(widthy, dtype)
    normal = jnp.asarray(normal, dtype)

    i = jnp.arange(ni, dtype=dtype)
    j = jnp.arange(nj, dtype=dtype)
    dx = (i + 0.5) / ni - 0.5  # [ni]
    dy = (j + 0.5) / nj - 0.5  # [nj]
    offset = dx[:, None, None] * widthx + dy[None, :, None] * widthy  # [ni,nj,4]
    x = pos + offset
    n = normal + offset  # curved screen: offsets tilt the normal too
    return x, n


def make_canvas(
    metric: MetricFn,
    pos,
    widthx,
    widthy,
    normal,
    ni: int,
    nj: int,
    dtype=None,
) -> Canvas:
    """Build the ni x nj canvas of ray initial conditions
    (reference: RayTraceGR.jl:457-478, vectorized)."""
    x, n = pixel_grid(pos, widthx, widthy, normal, ni, nj, dtype)
    x, u = pixel_rays(metric, x, n)
    return Canvas(pos=x, normal=u, rgb=jnp.zeros((ni, nj, 3), x.dtype))
