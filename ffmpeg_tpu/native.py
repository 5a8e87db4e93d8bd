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

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


class NativeUnavailable(FFTPUError):
    pass


def _source_files():
    return sorted(list(_CSRC.glob("*.cpp")) + list(_CSRC.glob("*.h")))


def _so_path() -> Path:
    """Cache path keyed by a content hash of csrc/ (mtimes are not
    preserved by git, so they can't be trusted for staleness)."""
    import hashlib
    h = hashlib.sha256()
    for p in _source_files():
        h.update(p.name.encode())
        h.update(p.read_bytes())
    cache = Path(os.environ.get("XDG_CACHE_HOME",
                                Path.home() / ".cache")) / "fftpu"
    return cache / f"_fftpu_native-{h.hexdigest()[:16]}.so"


def _build(so: Path) -> bool:
    srcs = [str(p) for p in _source_files() if p.suffix == ".cpp"]
    if not srcs:
        return False
    so.parent.mkdir(parents=True, exist_ok=True)
    tmp = so.with_suffix(".so.tmp")
    cmd = ["g++", "-O3", "-march=native", "-funroll-loops",
           "-shared", "-fPIC", "-std=c++17", "-o", str(tmp), *srcs]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        _log.log(None, _log.LogLevel.WARNING, f"native build failed: {e}")
        return False
    if r.returncode != 0:
        _log.log(None, _log.LogLevel.WARNING,
                 f"native build failed:\n{r.stderr.decode()[:2000]}")
        return False
    os.replace(tmp, so)
    return True


def get() -> ctypes.CDLL:
    """Return the loaded native library, building it if needed."""
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            raise NativeUnavailable("native library unavailable (build failed)")
        _tried = True
        so = _so_path()
        if not so.exists():
            if not _build(so):
                raise NativeUnavailable("could not build csrc/")
        try:
            _lib = ctypes.CDLL(str(so))
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
    if hasattr(lib, "mjpeg_split_segments"):
        lib.mjpeg_split_segments.restype = c.c_long
        lib.mjpeg_split_segments.argtypes = [
            c.c_char_p, c.c_long,
            c.POINTER(c.c_uint8), c.c_long,
            c.POINTER(c.c_int32), c.c_long,
        ]
    if hasattr(lib, "mjpeg_split_segments_strided"):
        lib.mjpeg_split_segments_strided.restype = c.c_long
        lib.mjpeg_split_segments_strided.argtypes = [
            c.c_char_p, c.c_long,
            c.POINTER(c.c_uint8), c.c_long, c.c_long,
            c.POINTER(c.c_int32),
        ]
    if hasattr(lib, "mjpeg_decode_scan"):
        lib.mjpeg_decode_scan.restype = c.c_int
        lib.mjpeg_decode_scan.argtypes = [
            c.c_char_p, c.c_long,
            c.c_char_p, c.c_char_p, c.c_char_p, c.c_char_p,
            c.POINTER(c.c_int), c.c_int,
            c.c_int, c.c_int, c.c_int, c.c_int,
            c.POINTER(c.POINTER(c.c_int16)),
        ]
