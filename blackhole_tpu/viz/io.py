"""Image output: PNG (via zlib, dependency-free) and PPM.

TPU-native stand-in for the reference's OpenGL texture upload path
(/root/reference/src/visualization/renderer.cpp:1381-1383) — frames are
written to files / returned as arrays instead of GL textures.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def to_uint8(img) -> np.ndarray:
    """Float [0,1] (H, W, 3) -> uint8, gamma-free (the reference does a
    straight float->u8 conversion too, renderer.cpp:2143-2148)."""
    arr = np.asarray(img)
    return np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)


def write_png(path: str, img) -> None:
    """Minimal RGB8 PNG encoder (no external deps)."""
    arr = to_uint8(img)
    h, w, _ = arr.shape
    raw = b"".join(
        b"\x00" + arr[y].tobytes() for y in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def write_ppm(path: str, img) -> None:
    """Binary PPM (P6)."""
    arr = to_uint8(img)
    h, w, _ = arr.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(arr.tobytes())


def write_image(path: str, img) -> None:
    if path.endswith(".ppm"):
        write_ppm(path, img)
    else:
        write_png(path, img)
