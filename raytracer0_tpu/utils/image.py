"""Image IO: dependency-free PNG writer + npy round-trip.

The reference displays to a canvas; the framework's displays are files.
Row 0 of our internal arrays is the image *bottom* (gl_FragCoord
convention, models/camera.py), so writers flip vertically.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def to_uint8(img) -> np.ndarray:
    """[0,1] float image -> uint8, flipping to top-down row order."""
    arr = np.asarray(img)
    arr = np.clip(arr, 0.0, 1.0)
    arr = (arr * 255.0 + 0.5).astype(np.uint8)
    return arr[::-1]  # bottom-up -> top-down


def write_png(path: str, img) -> None:
    """Write an [H, W, 3] (or [H, W]) float image in [0,1] as PNG."""
    arr = to_uint8(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w, _ = arr.shape

    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def write_npy(path: str, img) -> None:
    np.save(path, np.asarray(img))
