"""Image output utilities.

Reproduces the reference's PNG convention (/root/reference/src/RayTraceGR.jl:
563-575): the canvas is indexed ``(i, j)`` with ``i`` along ``widthx`` and
``j`` along ``widthy``; the Julia code transposes (``'``) before colorview, so
image row = j, column = i. ``canvas_to_image`` applies the same transpose.
"""

from __future__ import annotations

import os

import numpy as np


def canvas_to_image(rgb) -> np.ndarray:
    """Canvas rgb [ni, nj, 3] float in [0,1] -> uint8 image [nj, ni, 3].

    Matches Julia's ``colorview(RGB, R', G', B')`` transpose
    (RayTraceGR.jl:566-569) and Images.jl's round-to-nearest N0f8 encoding.
    """
    arr = np.asarray(rgb)
    img = np.transpose(arr, (1, 0, 2))
    img = np.clip(img, 0.0, 1.0)
    return np.round(img * 255.0).astype(np.uint8)


def save_png(path: str, rgb) -> str:
    """Write canvas rgb to a PNG file; returns the path.

    Uses the native C++ codec (utils/native.py, zlib DEFLATE) when built,
    PIL otherwise."""
    from . import native

    img = canvas_to_image(rgb)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if os.path.exists(path):
        os.remove(path)
    data = native.png_encode(img)
    if data is not None:
        with open(path, "wb") as f:
            f.write(data)
        return path
    from PIL import Image

    Image.fromarray(img, mode="RGB").save(path)
    return path


def load_png(path: str) -> np.ndarray:
    """Read a PNG into float64 [H, W, 3] in [0, 1]."""
    from . import native

    with open(path, "rb") as f:
        data = f.read()
    img = native.png_decode(data)
    if img is None:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float64)
        return img / 255.0
    return img.astype(np.float64) / 255.0
