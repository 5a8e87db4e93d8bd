"""Record/replay cache of reference-oracle invocations (golden vectors).

The reference commits 4,864 golden files under tests/ref/ so FATE can
validate a build without re-deriving expectations. This module is the
same idea for our differential suite: every subprocess call to the
locally built oracle (/tmp/ffbuild/ffmpeg|ffprobe) is content-keyed and
can be

- RECORDED into tests/data/golden/ when the oracle is present and
  FFTPU_GOLDEN_RECORD=1 (first write wins; keys are path-independent:
  file arguments are replaced by content digests), and
- REPLAYED when the oracle is absent (or FFTPU_GOLDEN_REPLAY=1), so a
  clean clone validates the differential tests without building FFmpeg.

A replay miss skips the test (same observable behavior as the old
"reference ffmpeg not built" skip, but far fewer of them).
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
import subprocess
import zlib
from pathlib import Path

GOLDEN = Path(__file__).parent / "data" / "golden"
INDEX = GOLDEN / "index.json"
MAX_ENTRY = 1 << 20          # compressed bytes per recorded entry
_REAL_RUN = subprocess.run
_TOOLS = {"ffmpeg", "ffprobe"}
_index: dict | None = None


def recording() -> bool:
    return os.environ.get("FFTPU_GOLDEN_RECORD") == "1"


def replaying(oracle_exists: bool) -> bool:
    return (not oracle_exists
            or os.environ.get("FFTPU_GOLDEN_REPLAY") == "1")


def have_golden() -> bool:
    return INDEX.exists()


def _load_index() -> dict:
    global _index
    if _index is None:
        _index = json.loads(INDEX.read_text()) if INDEX.exists() else {}
    return _index


def _digest_file(p: Path) -> str:
    h = hashlib.sha256()
    with open(p, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:16]


def _key(argv, inp, cwd, text=False) -> tuple[str, list[int]]:
    """Content-keyed, path-independent invocation key + output arg idxs."""
    toks = [Path(str(argv[0])).name]
    outs: list[int] = []
    for i, a in enumerate(argv[1:], 1):
        s = str(a)
        p = Path(s) if s.startswith("/") else None
        if p is not None and p.is_file():
            toks.append("FILE:" + _digest_file(p) + p.suffix)
        elif p is not None and not p.exists():
            toks.append("OUT" + p.suffix)
            outs.append(i)
        else:
            toks.append(s)
    if text:
        toks.append("TEXTMODE")      # str vs bytes stdout/stderr
    h = hashlib.sha256("\0".join(toks).encode())
    if cwd:
        h.update(b"\0CWD")           # cwd-relative runs aren't portable
    if inp:
        h.update(b"\0IN\0" + (inp if isinstance(inp, bytes)
                              else str(inp).encode()))
    return h.hexdigest()[:24], outs


def _snapshot_dirs(argv, outs):
    dirs = {Path(str(argv[i])).parent for i in outs}
    return {d: set(p.name for p in d.iterdir()) if d.is_dir() else set()
            for d in dirs}


def _record(key, argv, outs, proc, before=None) -> None:
    GOLDEN.mkdir(parents=True, exist_ok=True)
    idx = _load_index()
    if key in idx:
        return
    rec = {
        "returncode": proc.returncode,
        "stdout": proc.stdout,
        "stderr": proc.stderr,
        "outputs": {},
    }
    for i in outs:
        p = Path(str(argv[i]))
        if p.is_file():
            rec["outputs"][i] = p.read_bytes()
    # side files the muxer created next to a declared output but that
    # never appear in argv (dash/hls segments, init files)
    side = {}
    for d, names in (before or {}).items():
        if not d.is_dir():
            continue
        for p in sorted(d.iterdir()):
            if p.name not in names and p.is_file():
                side[str(p.name)] = p.read_bytes()
    if side:
        rec["side"] = {"dir_of": outs[0] if outs else None,
                       "files": side}
    blob = zlib.compress(pickle.dumps(rec), 9)
    if len(blob) > MAX_ENTRY:
        return
    (GOLDEN / f"{key}.bin").write_bytes(blob)
    idx[key] = {
        "tool": Path(str(argv[0])).name,
        "args": " ".join(str(a) for a in argv[1:])[:200],
        "test": os.environ.get("PYTEST_CURRENT_TEST", "")[:120],
        "bytes": len(blob),
    }
    INDEX.write_text(json.dumps(idx, indent=0, sort_keys=True))


def _replay(key, argv, outs, kwargs):
    import pytest
    path = GOLDEN / f"{key}.bin"
    if not path.exists():
        pytest.skip(f"golden vector not recorded ({key})")
    rec = pickle.loads(zlib.decompress(path.read_bytes()))
    for i, data in rec["outputs"].items():
        Path(str(argv[int(i)])).write_bytes(data)
    side = rec.get("side")
    if side and side["dir_of"] is not None:
        d = Path(str(argv[side["dir_of"]])).parent
        for name, data in side["files"].items():
            (d / name).write_bytes(data)
    proc = subprocess.CompletedProcess(
        argv, rec["returncode"], rec["stdout"], rec["stderr"])
    if kwargs.get("check") and rec["returncode"] != 0:
        raise subprocess.CalledProcessError(
            rec["returncode"], argv, rec["stdout"], rec["stderr"])
    return proc


def install(oracle_paths) -> None:
    """Patch subprocess.run to record/replay oracle invocations."""
    oracle_strs = {str(p) for p in oracle_paths}

    def run(argv, *a, **kw):
        if (not a and isinstance(argv, (list, tuple)) and argv
                and str(argv[0]) in oracle_strs
                and Path(str(argv[0])).name in _TOOLS):
            oracle_exists = Path(str(argv[0])).exists()
            text = bool(kw.get("text") or kw.get("universal_newlines"))
            key, outs = _key(argv, kw.get("input"), kw.get("cwd"), text)
            if replaying(oracle_exists):
                return _replay(key, argv, outs, kw)
            before = _snapshot_dirs(argv, outs) if recording() else None
            proc = _REAL_RUN(argv, *a, **kw)
            if recording():
                _record(key, argv, outs, proc, before)
            return proc
        return _REAL_RUN(argv, *a, **kw)

    subprocess.run = run
