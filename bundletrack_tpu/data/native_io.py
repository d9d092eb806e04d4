"""ctypes bindings for the native data-IO runtime (native/dataio.cpp).

Replaces the reference's synchronous OpenCV image loading
(reference: src/DataLoader.cpp readDepthImage/imread calls, src/Utils.cpp:49-68)
with a C++ PNG decoder + worker-thread prefetcher so disk IO and decode
overlap the accelerator step.  Builds on demand with g++ (no external deps
beyond zlib); falls back to a pure-Python PNG decoder if the toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import zlib
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libbtio.so"))

_lib = None


def _build_lib() -> Optional[str]:
    src = os.path.join(_NATIVE_DIR, "dataio.cpp")
    if not os.path.exists(src):
        return None
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
             src, "-lz", "-o", _LIB_PATH],
            check=True,
            capture_output=True,
        )
        return _LIB_PATH
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.btio_png_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.btio_png_info.restype = ctypes.c_int
    lib.btio_png_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long,
    ]
    lib.btio_png_read.restype = ctypes.c_long
    lib.btio_prefetcher_new.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_long,
        ctypes.c_uint32,
        ctypes.c_uint32,
    ]
    lib.btio_prefetcher_new.restype = ctypes.c_void_p
    lib.btio_prefetcher_free.argtypes = [ctypes.c_void_p]
    lib.btio_prefetcher_get.argtypes = [
        ctypes.c_void_p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.btio_prefetcher_get.restype = ctypes.c_long
    _lib = lib
    return lib


def _img_from_bytes(buf: np.ndarray, w: int, h: int, c: int, bits: int):
    if bits == 16:
        arr = buf[: h * w * c * 2].view(np.uint16)
    else:
        arr = buf[: h * w * c]
    arr = arr.reshape(h, w, c) if c > 1 else arr.reshape(h, w)
    return arr.copy()


def read_png(path: str) -> np.ndarray:
    """Decode a PNG to a numpy array (u8 or u16), native decoder preferred."""
    lib = get_lib()
    if lib is not None:
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        c = ctypes.c_uint32()
        bits = ctypes.c_uint32()
        if lib.btio_png_info(path.encode(), w, h, c, bits) == 0:
            cap = w.value * h.value * c.value * (bits.value // 8)
            buf = np.empty(cap, np.uint8)
            n = lib.btio_png_read(
                path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap
            )
            if n > 0:
                return _img_from_bytes(buf, w.value, h.value, c.value, bits.value)
    return _read_png_python(path)


class SequencePrefetcher:
    """Decode-ahead iterator over a list of PNG paths (native threads)."""

    def __init__(self, paths: Sequence[str], threads: int = 4, ahead: int = 8):
        self.paths = list(paths)
        self._lib = get_lib()
        self._handle = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._handle = self._lib.btio_prefetcher_new(
                arr, len(self.paths), threads, ahead
            )

    def get(self, idx: int) -> np.ndarray:
        if self._handle:
            w = ctypes.c_uint32()
            h = ctypes.c_uint32()
            c = ctypes.c_uint32()
            bits = ctypes.c_uint32()
            cap = 64 * 1024 * 1024
            buf = np.empty(cap, np.uint8)
            n = self._lib.btio_prefetcher_get(
                self._handle, idx,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
                w, h, c, bits,
            )
            if n > 0:
                return _img_from_bytes(buf, w.value, h.value, c.value, bits.value)
        return _read_png_python(self.paths[idx])

    def close(self):
        if self._handle and self._lib:
            self._lib.btio_prefetcher_free(self._handle)
            self._handle = None

    def __del__(self):
        self.close()


# ---------------------------------------------------------------------------
# Pure-Python fallback PNG decoder (no deps)
# ---------------------------------------------------------------------------


def _paeth(a, b, c):
    p = a.astype(np.int32) + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def _read_png_python(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", f"not a PNG: {path}"
    pos = 8
    idat = b""
    palette = None
    meta = None
    while pos + 8 <= len(data):
        (length,) = np.frombuffer(data[pos : pos + 4], ">u4")
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h = np.frombuffer(payload[:8], ">u4")
            bits, color, _, _, interlace = payload[8:13]
            assert interlace == 0, "interlaced PNG unsupported"
            meta = (int(w), int(h), int(bits), int(color))
        elif ctype == b"PLTE":
            palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += bytes(payload)
        elif ctype == b"IEND":
            break
        pos += 12 + int(length)
    w, h, bits, color = meta
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    bpp = channels * (bits // 8)
    stride = w * bpp
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    recon = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        line = raw[y, 1:].astype(np.int32)
        ft = filters[y]
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) & 0xFF
        else:
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ft == 3:
                    cur[x] = (line[x] + (a + b) // 2) & 0xFF
                elif ft == 4:
                    pp = a + b - c
                    pa, pb_, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                    pred = a if (pa <= pb_ and pa <= pc) else (b if pb_ <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
        recon[y] = cur.astype(np.uint8)
        prev = cur
    if color == 3:
        idxs = recon.reshape(h, w)
        return palette[idxs]
    if bits == 16:
        arr = recon.reshape(h, w, channels, 2)
        out = (arr[..., 0].astype(np.uint16) << 8) | arr[..., 1]
        return out[..., 0] if channels == 1 else out
    arr = recon.reshape(h, w, channels)
    return arr[..., 0] if channels == 1 else arr


def write_png(path: str, arr: np.ndarray) -> None:
    """Minimal PNG writer (for tests/tools): u8 gray/RGB or u16 gray."""
    arr = np.asarray(arr)
    if arr.dtype == np.uint16:
        assert arr.ndim == 2
        color, bits = 0, 16
        payload = arr.astype(">u2").tobytes()
        stride = arr.shape[1] * 2
    elif arr.ndim == 2:
        color, bits = 0, 8
        payload = arr.astype(np.uint8).tobytes()
        stride = arr.shape[1]
    else:
        assert arr.shape[2] == 3
        color, bits = 2, 8
        payload = arr.astype(np.uint8).tobytes()
        stride = arr.shape[1] * 3
    h = arr.shape[0]
    rows = b"".join(
        b"\x00" + payload[y * stride : (y + 1) * stride] for y in range(h)
    )
    comp = zlib.compress(rows)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return (
            len(data).to_bytes(4, "big") + ctype + data + crc.to_bytes(4, "big")
        )

    ihdr = (
        int(arr.shape[1]).to_bytes(4, "big")
        + int(h).to_bytes(4, "big")
        + bytes([bits, color, 0, 0, 0])
    )
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", comp))
        f.write(chunk(b"IEND", b""))
