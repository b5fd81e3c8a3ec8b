"""Native C++ PNG codec tests: roundtrip fidelity, cross-validation against
PIL, and decoding the reference's committed golden images."""

import os

import numpy as np
import pytest

from raytracegr_jl_tpu.utils import native
from raytracegr_jl_tpu.utils.image import load_png, save_png


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native codec unavailable (no g++?)")
    return lib


def test_roundtrip(lib, tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    data = native.png_encode(img)
    assert data is not None and data[:4] == b"\x89PNG"
    out = native.png_decode(data)
    np.testing.assert_array_equal(out, img)


def test_matches_pil_decode(lib):
    """Our encoder's output decodes identically under PIL."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    data = native.png_encode(img)
    pil_img = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(pil_img, img)


def test_decodes_reference_golden(lib):
    """The committed goldens from the reference repo decode correctly
    (cross-checked against PIL)."""
    path = "/root/reference/scenes/sphere.png"
    if not os.path.exists(path):
        pytest.skip("reference goldens not mounted")
    with open(path, "rb") as f:
        ours = native.png_decode(f.read())
    PIL = pytest.importorskip("PIL.Image")
    theirs = np.asarray(PIL.open(path).convert("RGB"))
    np.testing.assert_array_equal(ours, theirs)


def test_save_load_roundtrip(lib, tmp_path):
    rgb = np.random.default_rng(2).random((20, 30, 3))
    p = str(tmp_path / "x.png")
    save_png(p, rgb)
    back = load_png(p)  # [W, H] transposed per canvas convention
    # save transposes canvas [ni, nj] -> image [nj, ni]; compare through the
    # same convention
    from raytracegr_jl_tpu.utils.image import canvas_to_image

    expect = canvas_to_image(rgb).astype(np.float64) / 255.0
    np.testing.assert_allclose(back, expect, atol=1e-12)
