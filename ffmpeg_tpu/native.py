"""Loader for the native (C++) host runtime — entropy decoders and other
bit-serial hot paths that stay on the CPU (SURVEY.md §7 "host entropy →
TPU transform" split). Builds csrc/ into _fftpu_native.so on first use and
binds it via ctypes; callers must handle NativeUnavailable gracefully."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import threading
from pathlib import Path
from typing import Optional

from .utils.error import FFTPUError
from .utils import log as _log

_REPO = Path(__file__).resolve().parent.parent
_CSRC = _REPO / "csrc"
_SO = _REPO / "ffmpeg_tpu" / "_fftpu_native.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


class NativeUnavailable(FFTPUError):
    pass


_SOURCES = ["mjpeg_huff.cpp", "vlc.cpp", "cabac.cpp", "range_coder.cpp"]


def _build() -> bool:
    srcs = [str(_CSRC / s) for s in _SOURCES if (_CSRC / s).exists()]
    if not srcs:
        return False
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_SO), *srcs]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        _log.log(None, _log.LogLevel.WARNING, f"native build failed: {e}")
        return False
    if r.returncode != 0:
        _log.log(None, _log.LogLevel.WARNING,
                 f"native build failed:\n{r.stderr.decode()[:2000]}")
        return False
    return True


def _newer_than_so() -> bool:
    if not _SO.exists():
        return True
    so_mtime = _SO.stat().st_mtime
    return any((_CSRC / s).exists() and (_CSRC / s).stat().st_mtime > so_mtime
               for s in _SOURCES + ["bitreader.h"])


def get() -> ctypes.CDLL:
    """Return the loaded native library, building it if needed."""
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            raise NativeUnavailable("native library unavailable (build failed)")
        _tried = True
        if _newer_than_so():
            if not _build():
                raise NativeUnavailable("could not build csrc/")
        try:
            _lib = ctypes.CDLL(str(_SO))
        except OSError as e:
            raise NativeUnavailable(str(e))
        _bind(_lib)
        return _lib


def available() -> bool:
    try:
        get()
        return True
    except NativeUnavailable:
        return False


def _bind(lib: ctypes.CDLL) -> None:
    c = ctypes
    if hasattr(lib, "mjpeg_decode_scan"):
        lib.mjpeg_decode_scan.restype = c.c_int
        lib.mjpeg_decode_scan.argtypes = [
            c.c_char_p, c.c_long,
            c.c_char_p, c.c_char_p, c.c_char_p, c.c_char_p,
            c.POINTER(c.c_int), c.c_int,
            c.c_int, c.c_int, c.c_int, c.c_int,
            c.POINTER(c.POINTER(c.c_int16)),
        ]
