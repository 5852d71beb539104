"""Native (C++) runtime components.

``videodec`` — FFmpeg-based video decoder (the decord replacement, see
``videodec.cpp``). The shared library builds on first import with the system
toolchain (g++ + libav*); set ``MERV_TPU_NO_NATIVE=1`` to disable and fall
back to the cv2/imageio python backends.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_HERE = Path(__file__).resolve().parent
_SO = _HERE / "libvideodec.so"
_SRC = _HERE / "videodec.cpp"
_HASH = _HERE / "libvideodec.so.srchash"

_LIBS = ["-lavformat", "-lavcodec", "-lavutil", "-lswscale"]
_CMD = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17"]


def _src_hash() -> str:
    import hashlib

    h = hashlib.sha256()
    h.update(" ".join(_CMD + _LIBS).encode())
    h.update(_SRC.read_bytes())
    return h.hexdigest()


def _build() -> None:
    cmd = _CMD + ["-o", str(_SO), str(_SRC)] + _LIBS
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    _HASH.write_text(_src_hash())


def _load() -> ctypes.CDLL:
    if os.environ.get("MERV_TPU_NO_NATIVE", "0") == "1":
        raise ImportError("native decode disabled via MERV_TPU_NO_NATIVE")
    # The .so is never committed (see .gitignore); it is built from the
    # reviewed videodec.cpp on first import. The sidecar hash records the
    # exact source + flags the binary came from — mtime comparison is
    # useless on a fresh clone (checkout stamps everything identically) and
    # would happily dlopen a stale or foreign binary.
    if not _SO.exists() or not _HASH.exists() or _HASH.read_text().strip() != _src_hash():
        _build()
    lib = ctypes.CDLL(str(_SO))
    lib.vr_open.restype = ctypes.c_void_p
    lib.vr_open.argtypes = [ctypes.c_char_p]
    lib.vr_num_frames.restype = ctypes.c_int64
    lib.vr_num_frames.argtypes = [ctypes.c_void_p]
    lib.vr_fps.restype = ctypes.c_double
    lib.vr_fps.argtypes = [ctypes.c_void_p]
    lib.vr_width.restype = ctypes.c_int
    lib.vr_width.argtypes = [ctypes.c_void_p]
    lib.vr_height.restype = ctypes.c_int
    lib.vr_height.argtypes = [ctypes.c_void_p]
    lib.vr_last_error.restype = ctypes.c_char_p
    lib.vr_last_error.argtypes = [ctypes.c_void_p]
    lib.vr_get_batch.restype = ctypes.c_int
    lib.vr_get_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vr_get_batch_resized.restype = ctypes.c_int
    lib.vr_get_batch_resized.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vr_close.restype = None
    lib.vr_close.argtypes = [ctypes.c_void_p]
    return lib


_lib: Optional[ctypes.CDLL] = None


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


class _VideoReader:
    """decord.VideoReader-style handle over the C ABI."""

    def __init__(self, path: str) -> None:
        lib = get_lib()
        self._lib = lib
        self._h = lib.vr_open(str(path).encode())
        if not self._h:
            raise IOError(f"native decoder cannot open {path}")

    def num_frames(self) -> int:
        return int(self._lib.vr_num_frames(self._h))

    def avg_fps(self) -> float:
        return float(self._lib.vr_fps(self._h))

    @property
    def width(self) -> int:
        return int(self._lib.vr_width(self._h))

    @property
    def height(self) -> int:
        return int(self._lib.vr_height(self._h))

    def _ids(self, frame_ids: Sequence[int]):
        arr = (ctypes.c_int64 * len(frame_ids))(*[int(i) for i in frame_ids])
        return arr

    def get_batch(self, frame_ids: List[int]) -> np.ndarray:
        n = len(frame_ids)
        out = np.empty((n, self.height, self.width, 3), np.uint8)
        rc = self._lib.vr_get_batch(
            self._h, self._ids(frame_ids), n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        if rc < 0:
            raise IOError(f"native decode failed: {self._lib.vr_last_error(self._h).decode()}")
        return out

    def get_batch_resized(self, frame_ids: List[int], width: int, height: int, bicubic: bool = True) -> np.ndarray:
        """Fused decode+resize (capability beyond decord)."""
        n = len(frame_ids)
        out = np.empty((n, height, width, 3), np.uint8)
        rc = self._lib.vr_get_batch_resized(
            self._h, self._ids(frame_ids), n, width, height, int(bicubic),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc < 0:
            raise IOError(f"native decode failed: {self._lib.vr_last_error(self._h).decode()}")
        return out

    def close(self) -> None:
        if self._h:
            self._lib.vr_close(self._h)
            self._h = None

    def __del__(self) -> None:  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class videodec:  # namespace mirroring `from merv_tpu.native import videodec`
    VideoReader = _VideoReader
