"""Inversion-driver smoke tests (full optimization runs live in
benchmarks/; CI keeps them tiny)."""

import jax.numpy as jnp
import numpy as np

from raytracegr_jl_tpu.grad import InverseParams, default_inverse_cfg, \
    make_render_for_params
from raytracegr_jl_tpu.inverse import FitResult, fit
from raytracegr_jl_tpu.models.scenes import example1_spec


def test_fit_runs_and_tracks_history():
    spec = example1_spec(8, 8)
    cfg = default_inverse_cfg(jnp.float64, max_steps=24, rk4_dt=0.5,
                              soft_temp=0.05)
    truth = InverseParams(M=jnp.asarray(1.0), a=jnp.asarray(0.0),
                          sphere_pos=jnp.asarray([0.0, 0.0, 0.0, 0.0]))
    render = make_render_for_params(spec, cfg, 2, jnp.float64)
    target = render(truth)

    init = truth._replace(sphere_pos=jnp.asarray([0.0, 0.0, 0.0, 0.08]))
    res = fit(spec, target, init, cfg, steps=5, learning_rate=2e-2,
              dtype=jnp.float64)
    assert isinstance(res, FitResult)
    assert res.loss_history.shape == (5,)
    assert np.isfinite(np.asarray(res.loss_history)).all()
    # best iterate is no worse than the starting loss
    assert float(res.loss) <= float(res.loss_history[0]) + 1e-12
