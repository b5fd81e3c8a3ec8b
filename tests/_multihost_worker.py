"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Each process owns 4 virtual CPU devices; jax.distributed stitches them into
one 8-device global mesh spanning both processes. Runs the FULL sharded
train step (differentiable render -> pixel loss -> (M, a, pose) grads with
the cross-process all-reduce) and prints the loss + updated M for the parent
test to compare across processes.

Beyond value agreement (which a replicated program satisfies trivially —
the round-2 false positive), this worker asserts the program actually
PARTITIONS across processes: each process addresses only 1/nproc of the
global batch rows, and the compiled executable contains all-reduce
collectives.

Usage: python tests/_multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracegr_jl_tpu.parallel.sharding import (  # noqa: E402
    init_distributed, global_pixels, make_mesh, sharded_value_and_grad)

assert init_distributed(f"localhost:{port}", nproc, pid), "not multi-process"
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())
assert len(jax.local_devices()) == 4

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from raytracegr_jl_tpu.grad import (  # noqa: E402
    InverseParams, default_inverse_cfg, flat_pixel_grid, make_ray_loss_fn,
    make_ray_render_for_params)
from raytracegr_jl_tpu.models.scenes import example2_spec  # noqa: E402

dtype = jnp.float64
mesh = make_mesh()  # global: spans both processes
spec = example2_spec(16, 8)
B = spec.ni * spec.nj
cfg = default_inverse_cfg(dtype, max_steps=16, rk4_dt=0.5, stop_rho=0.5)

truth = InverseParams(M=jnp.asarray(1.0, dtype), a=jnp.asarray(0.0, dtype),
                      sphere_pos=jnp.asarray([0.0, 4.0, 0.0, 0.0], dtype))
render = make_ray_render_for_params(spec, cfg, sphere_index=2, dtype=dtype)
xg, ng = flat_pixel_grid(spec, dtype)
# Every process computes the same logical target; global_pixels places only
# the locally-addressable shards.
target = jax.block_until_ready(render(truth, xg, ng))
xg_s, ng_s, tg_s = global_pixels(mesh, np.asarray(xg), np.asarray(ng),
                                 np.asarray(target))

# --- partitioning assertions (can NOT be satisfied by replication) ---------
# 1. This process addresses only its 1/nproc of the global batch rows.
local_rows = sum(s.data.shape[0] for s in xg_s.addressable_shards)
assert local_rows == B // nproc, (local_rows, B, nproc)

loss_fn = make_ray_loss_fn(spec, cfg, sphere_index=2, dtype=dtype)
p = truth._replace(M=jnp.asarray(1.05, dtype))
step = sharded_value_and_grad(loss_fn, mesh)

# 2. The compiled executable communicates: all-reduce collectives present.
compiled = step.lower(p, xg_s, ng_s, tg_s).compile()
assert compiled.as_text().count("all-reduce") > 0, (
    "multi-host step compiled with ZERO all-reduce ops (replicated)")

loss, g = jax.block_until_ready(step(p, xg_s, ng_s, tg_s))

m_new = float(p.M) - 0.5 * float(g.M)
assert np.isfinite(float(loss)) and np.isfinite(m_new)
# Every process must agree bit-for-bit (same global program, replicated out).
print(f"RESULT {float(loss):.17e} {m_new:.17e}", flush=True)
