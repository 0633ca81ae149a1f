"""Output sinks — the Screen abstraction.

TPU re-design of the reference Screen/CanvasScreen
(/root/reference/src/view/screen.ts:25-47, screen_canvas.ts): the browser
canvas ``ImageData`` sink becomes u8 quantization (screen_canvas.ts:92-94,
``dynamic_range()`` = 8 bits, :96-98) plus file writers — PNG via PIL when
available, always-available ``.npy``. Batch rendering replaces interactive
flushes (SURVEY.md §2 #31/#33: interactivity is out of scope on TPU).
"""
from __future__ import annotations

import pathlib
from typing import Union

import numpy as np

PathLike = Union[str, pathlib.Path]

#: display bit depth (screen_canvas.ts:96-98)
DYNAMIC_RANGE_BITS = 8


def quantize_u8(img) -> np.ndarray:
    """[0,1] float -> u8 (screen_canvas.ts:92-94: round(c * 0xff))."""
    arr = np.asarray(img, np.float32)
    return np.clip(np.rint(arr * 255.0), 0, 255).astype(np.uint8)


def write_png(path: PathLike, img) -> pathlib.Path:
    """Write a [h, w, 3] image in [0, 1] as PNG (falls back to .npy when PIL
    is unavailable). Returns the path actually written."""
    path = pathlib.Path(path)
    u8 = quantize_u8(img)
    try:
        from PIL import Image
    except ImportError:
        path = path.with_suffix(".npy")
        np.save(path, u8)
        return path
    Image.fromarray(u8, mode="RGB").save(path)
    return path


def write_npy(path: PathLike, img) -> pathlib.Path:
    """Raw HDR dump for exact golden comparisons."""
    path = pathlib.Path(path).with_suffix(".npy")
    np.save(path, np.asarray(img, np.float32))
    return path
