"""Checkpoint/resume under PREEMPTION semantics (VERDICT r2 weak #7): an
inversion run interrupted mid-flight, checkpointed through orbax to disk,
and resumed in a "fresh process" (new fit call, new optimizer/loss objects)
must continue exactly — bit-identical trajectory to an uninterrupted run.
The reference has no checkpointing at all (SURVEY.md §5: a render is one
shot); this is the TPU-pod reality the new framework covers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracegr_jl_tpu.grad import (InverseParams, default_inverse_cfg,
                                    make_render_for_params)
from raytracegr_jl_tpu.inverse import fit
from raytracegr_jl_tpu.models.scenes import example1_spec
from raytracegr_jl_tpu.utils.checkpoint import restore, save


def _setup(dtype):
    spec = example1_spec(8, 8)
    cfg = default_inverse_cfg(dtype, max_steps=24, rk4_dt=0.5,
                              soft_temp=0.05)
    truth = InverseParams(M=jnp.asarray(1.0, dtype),
                          a=jnp.asarray(0.0, dtype),
                          sphere_pos=jnp.asarray([0., 0., 0., 0.], dtype))
    render = make_render_for_params(spec, cfg, 2, dtype)
    target = render(truth)
    init = truth._replace(sphere_pos=jnp.asarray([0., 0., 0., 0.08], dtype))
    return spec, cfg, target, init


@pytest.mark.heavy
def test_preempted_fit_resumes_bit_identical(tmp_path):
    """fit(12) -> orbax checkpoint -> restore -> fit(12, opt_state=...)
    equals fit(24) exactly: same final params, same loss tail."""
    dtype = jnp.float64
    spec, cfg, target, init = _setup(dtype)

    full = fit(spec, target, init, cfg, steps=24, learning_rate=2e-2,
               dtype=dtype)

    part1 = fit(spec, target, init, cfg, steps=12, learning_rate=2e-2,
                dtype=dtype)
    # "Preemption": persist the resume state to disk and drop the objects.
    ckpt = {"params": part1.final_params, "opt_state": part1.opt_state}
    path = save(str(tmp_path / "ckpt"), ckpt)
    restored = restore(path, ckpt)
    del part1, ckpt

    part2 = fit(spec, target,
                InverseParams(*restored["params"]), cfg, steps=12,
                learning_rate=2e-2, opt_state=restored["opt_state"],
                dtype=dtype)

    np.testing.assert_array_equal(np.asarray(part2.final_params.M),
                                  np.asarray(full.final_params.M))
    np.testing.assert_array_equal(np.asarray(part2.final_params.sphere_pos),
                                  np.asarray(full.final_params.sphere_pos))
    np.testing.assert_array_equal(np.asarray(part2.loss_history),
                                  np.asarray(full.loss_history[12:]))


@pytest.mark.heavy
def test_checkpoint_roundtrip_preserves_opt_state_structure(tmp_path):
    """The orbax round-trip preserves the optax state pytree (nested
    NamedTuples of arrays) well enough to keep optimizing — structure
    flattens identically and every leaf is bit-equal."""
    dtype = jnp.float32
    spec, cfg, target, init = _setup(dtype)
    r = fit(spec, target, init, cfg, steps=3, learning_rate=2e-2,
            dtype=dtype)
    state = {"params": r.final_params, "opt_state": r.opt_state}
    path = save(str(tmp_path / "ckpt2"), state)
    back = restore(path, state)
    la, ta = jax.tree.flatten(state)[0], jax.tree.flatten(back)[0]
    assert len(la) == len(ta)
    for a, b in zip(la, ta):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
