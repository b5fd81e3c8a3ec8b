"""Scene JSON round-trip and checkpoint save/restore tests."""

import jax.numpy as jnp
import numpy as np

from raytracegr_jl_tpu.models.scenes import example2_spec
from raytracegr_jl_tpu.models.serialize import (load_spec, save_spec,
                                                spec_from_dict, spec_to_dict)


def test_spec_roundtrip_dict():
    spec = example2_spec(64, 32, M=1.2, a=0.5, r_formula="textbook")
    back = spec_from_dict(spec_to_dict(spec))
    assert back.metric_name == spec.metric_name
    assert float(back.metric_params.M) == 1.2
    assert float(back.metric_params.a) == 0.5
    assert back.r_formula == "textbook"
    assert back.ni == 64 and back.nj == 32
    assert len(back.objects) == len(spec.objects)
    assert back.objects[0].radius == spec.objects[0].radius


def test_spec_roundtrip_file(tmp_path):
    spec = example2_spec(16, 16)
    p = str(tmp_path / "scene.json")
    save_spec(p, spec)
    back = load_spec(p)
    # renders built from the original and the round-tripped spec agree
    from raytracegr_jl_tpu.models.scenes import build

    _, scene_a, canvas_a = build(spec, jnp.float64)
    _, scene_b, canvas_b = build(back, jnp.float64)
    np.testing.assert_array_equal(np.asarray(canvas_a.pos),
                                  np.asarray(canvas_b.pos))
    np.testing.assert_array_equal(np.asarray(scene_a.radius),
                                  np.asarray(scene_b.radius))


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from raytracegr_jl_tpu.grad import InverseParams
    from raytracegr_jl_tpu.utils import checkpoint

    state = {
        "params": InverseParams(M=jnp.asarray(1.5), a=jnp.asarray(0.3),
                                sphere_pos=jnp.arange(4.0)),
        "step": jnp.asarray(7),
    }
    p = str(tmp_path / "ckpt")
    checkpoint.save(p, state)
    back = checkpoint.restore(p, state)
    assert float(back["params"].M) == 1.5
    assert int(back["step"]) == 7
    np.testing.assert_array_equal(np.asarray(back["params"].sphere_pos),
                                  np.arange(4.0))
