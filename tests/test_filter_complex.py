"""CLI -filter_complex: labeled multi-in/multi-out graphs wired to
stream inputs and mapped outputs, compared against the reference CLI
(framecrc byte-compat output)."""

import subprocess
import sys

import numpy as np
import pytest

import refutil
from conftest import requires_ref


def _make_src(tmp_path, name="src.avi"):
    """Lossless source (rawvideo + pcm) so filter outputs can be
    compared byte-exactly."""
    p = tmp_path / name
    subprocess.run(
        [str(refutil.REF), "-v", "error",
         "-f", "lavfi", "-i", "testsrc2=size=192x128:rate=25",
         "-f", "lavfi", "-i", "sine=frequency=440:sample_rate=44100",
         "-frames:v", "12", "-c:v", "rawvideo", "-pix_fmt", "yuv420p",
         "-c:a", "pcm_s16le", str(p)], check=True)
    return p


_seq = [0]


def _ours(args):
    # in-process (the axon TPU plugin ignores JAX_PLATFORMS in
    # subprocesses and stalls on tunnel init; conftest already forces
    # the CPU backend here)
    import tempfile, pathlib
    from ffmpeg_tpu.cli import ffmpeg as cli
    _seq[0] += 1
    out = pathlib.Path(tempfile.mkdtemp()) / f"o{_seq[0]}.crc"
    cli.main(["-v", "error", *args, "-f", "framecrc", "-y", str(out)])
    return out.read_text()


def _ref(args):
    return subprocess.run(
        [str(refutil.REF), "-v", "error", "-bitexact", *args,
         "-f", "framecrc", "-"],
        check=True, capture_output=True, text=True).stdout


def _crc_rows(txt):
    return [l for l in txt.splitlines() if l and l[0].isdigit()]


@requires_ref
def test_fc_crop(tmp_path):
    src = _make_src(tmp_path)
    args = ["-i", str(src),
            "-filter_complex", "[0:v]crop=96:64:16:8[outv]",
            "-map", "[outv]"]
    assert _crc_rows(_ours(args)) == _crc_rows(_ref(args))


@requires_ref
def test_fc_split_overlay(tmp_path):
    src = _make_src(tmp_path)
    g = "[0:v]split[a][b];[b]hflip[c];[a][c]overlay=x=40:y=30[outv]"
    args = ["-i", str(src), "-filter_complex", g, "-map", "[outv]"]
    assert _crc_rows(_ours(args)) == _crc_rows(_ref(args))


@requires_ref
def test_fc_audio(tmp_path):
    src = _make_src(tmp_path)
    args = ["-i", str(src),
            "-filter_complex", "[0:a]volume=0.5[outa]",
            "-map", "[outa]"]
    assert _crc_rows(_ours(args)) == _crc_rows(_ref(args))


@requires_ref
def test_fc_two_outputs(tmp_path):
    src = _make_src(tmp_path)
    g = "[0:v]crop=128:96:0:0[outv];[0:a]volume=0.25[outa]"
    args = ["-i", str(src), "-filter_complex", g,
            "-map", "[outv]", "-map", "[outa]"]
    assert _crc_rows(_ours(args)) == _crc_rows(_ref(args))


@requires_ref
def test_fc_two_graphs_same_input_label(tmp_path):
    """Two separate -filter_complex graphs both consuming [0:v] (legal in
    the reference CLI): each must be fed the stream independently."""
    src = _make_src(tmp_path)
    args = ["-i", str(src),
            "-filter_complex", "[0:v]crop=96:64:0:0[a]",
            "-filter_complex", "[0:v]hflip[b]",
            "-map", "[a]", "-map", "[b]"]
    assert _crc_rows(_ours(args)) == _crc_rows(_ref(args))
