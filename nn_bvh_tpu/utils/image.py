"""Image IO: PNG / PFM / EXR write+read (host-side).

Counterpart of the reference's `util/image.h:216` Image class (EXR/PNG/PFM/QOI
via vendored libs). We write PNG with zlib (stdlib), PFM natively, and
uncompressed scanline EXR (half/float) with a minimal encoder — no external
image dependencies.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# ---------------------------------------------------------------------------
# PNG (8-bit sRGB)
# ---------------------------------------------------------------------------

def write_png(path: str, rgb: np.ndarray) -> None:
    """rgb: (H,W,3) float linear [0,1]-ish -> gamma-encoded 8-bit PNG."""
    from ..core import colorspace
    import jax.numpy as jnp

    arr = np.asarray(colorspace.srgb_encode(jnp.asarray(rgb)))
    img = (np.clip(arr, 0, 1) * 255 + 0.5).astype(np.uint8)
    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


# ---------------------------------------------------------------------------
# PFM (float32, linear)
# ---------------------------------------------------------------------------

def write_pfm(path: str, rgb: np.ndarray) -> None:
    rgb = np.asarray(rgb, np.float32)
    h, w = rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n" if rgb.ndim == 3 else b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little-endian
        f.write(rgb[::-1].tobytes())  # bottom-up


def read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().strip()
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
    c = 3 if header == b"PF" else 1
    img = data.reshape(h, w, c) if c == 3 else data.reshape(h, w)
    return np.ascontiguousarray(img[::-1])


# ---------------------------------------------------------------------------
# EXR (uncompressed scanline, float32) — minimal spec-conformant writer
# ---------------------------------------------------------------------------

def _exr_attr(name: bytes, typ: bytes, data: bytes) -> bytes:
    return name + b"\x00" + typ + b"\x00" + struct.pack("<I", len(data)) + data


def write_exr(path: str, rgb: np.ndarray) -> None:
    """Uncompressed FLOAT scanline EXR, channels B,G,R (alphabetical per spec)."""
    rgb = np.asarray(rgb, np.float32)
    h, w, _ = rgb.shape
    channels = b""
    for name in (b"B", b"G", b"R"):
        channels += name + b"\x00" + struct.pack("<iiii", 2, 0, 1, 1)  # FLOAT
    channels += b"\x00"
    header = b""
    header += _exr_attr(b"channels", b"chlist", channels)
    header += _exr_attr(b"compression", b"compression", b"\x00")  # NO_COMPRESSION
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _exr_attr(b"dataWindow", b"box2i", box)
    header += _exr_attr(b"displayWindow", b"box2i", box)
    header += _exr_attr(b"lineOrder", b"lineOrder", b"\x00")
    header += _exr_attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _exr_attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0))
    header += _exr_attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\x00"

    magic = struct.pack("<I", 20000630) + struct.pack("<I", 2)
    offset_table_pos = len(magic) + len(header)
    data_start = offset_table_pos + 8 * h
    line_size = 8 + w * 4 * 3  # y + size prefix + 3 float channels
    offsets = b"".join(struct.pack("<Q", data_start + y * line_size) for y in range(h))
    lines = []
    for y in range(h):
        px = rgb[y]
        payload = (
            np.ascontiguousarray(px[:, 2]).tobytes()
            + np.ascontiguousarray(px[:, 1]).tobytes()
            + np.ascontiguousarray(px[:, 0]).tobytes()
        )
        lines.append(struct.pack("<i", y) + struct.pack("<i", len(payload)) + payload)
    with open(path, "wb") as f:
        f.write(magic + header + offsets + b"".join(lines))


def read_exr(path: str) -> np.ndarray:
    """Read any scanline EXR (NONE/RLE/ZIP/ZIPS/PIZ; HALF/FLOAT) as RGB —
    full reader in utils/exr.py (OpenEXR codecs reimplemented, incl. the PIZ
    wavelet/Huffman codec the golden TungstenRender.exr images use)."""
    from . import exr as exr_mod

    return exr_mod.read_rgb(path)


# ---------------------------------------------------------------------------
# error metrics (image.h MSE/MRSE analog, used by imgtool diff / --mse-reference)
# ---------------------------------------------------------------------------

def mse(a: np.ndarray, b: np.ndarray) -> float:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.mean((a - b) ** 2))


def mrse(a: np.ndarray, ref: np.ndarray) -> float:
    a, ref = np.asarray(a, np.float64), np.asarray(ref, np.float64)
    return float(np.mean((a - ref) ** 2 / (ref**2 + 0.01)))
