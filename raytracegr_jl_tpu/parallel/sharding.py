"""Multi-chip scaling: pixel/ray grid sharded over a jax.sharding.Mesh.

The reference's only parallelism is a shared-memory thread ensemble
(/root/reference/src/RayTraceGR.jl:507-511, README.md:35-37); its
multi-process attempt was abandoned (README.md:129-136). Here scaling is the
TPU-native story (SURVEY.md §2a): rays are embarrassingly parallel, so the
forward render shards the pixel batch over the mesh with ZERO communication,
and the inversion config all-reduces only the tiny (M, a, pose) gradient
pytree — XLA inserts the psum over ICI automatically from the sharding
annotations.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
everything below is host-count agnostic because it only speaks in terms of
the global mesh.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(devices: Sequence[jax.Device] | None = None,
              axis_name: str = RAY_AXIS) -> Mesh:
    """1-D mesh over all (or given) devices; rays shard along it."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis_name,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (pixel-row / ray-batch) axis over the mesh."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pixels(mesh: Mesh, *arrays: jax.Array) -> tuple[jax.Array, ...]:
    """Place pixel arrays [ni, nj, ...] with ni sharded over the mesh.

    ni must be divisible by the mesh size (pad the canvas if not — render
    sizes here are multiples of typical mesh sizes).
    """
    sh = ray_sharding(mesh)
    return tuple(jax.device_put(a, sh) for a in arrays)


def sharded_render(render, mesh: Mesh):
    """Compile a renderer ``(pos, normal) -> rgb`` with the pixel grid
    sharded over the mesh. Rays are independent => no collectives are
    generated; each chip traces its slice of the ray batch."""
    sh = ray_sharding(mesh)
    return jax.jit(render, in_shardings=(sh, sh), out_shardings=sh)


def sharded_value_and_grad(loss_fn, mesh: Mesh):
    """Compile ``params -> (loss, grads)`` with replicated params.

    The pixel reduction inside the loss runs sharded; XLA all-reduces the
    partial parameter gradients over ICI (the only communication in the
    program) and overlaps it with the backward pass.
    """
    rep = replicated(mesh)
    vg = jax.value_and_grad(loss_fn)
    return jax.jit(vg, in_shardings=(rep,), out_shardings=(rep, rep))
