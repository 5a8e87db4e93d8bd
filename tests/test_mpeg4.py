"""MPEG-4 part 2 (ASP) decoder tests: reference-encoded streams
decoded by both sides; the only expected difference is the IDCT
approximation (same ±2 / PSNR-gated policy as the mpeg12 tests)."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.io.demux import open_input
from ffmpeg_tpu.codecs import CodecContext

W, H = 176, 144


def _make(tmp_path, name, extra, frames=10, size=f"{W}x{H}"):
    p = tmp_path / name
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "lavfi", "-i",
         f"testsrc2=size={size}:rate=25", "-frames:v", str(frames),
         "-c:v", "mpeg4", *extra, "-y", str(p)], check=True)
    return p


def _ours(path):
    d = open_input(str(path))
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    pkts = []
    while True:
        try:
            pkts.append(d.read_packet())
        except Exception:
            break
    return dec.decode_all(pkts)


def _ref(path, w, h):
    out = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(path), "-f",
         "rawvideo", "-pix_fmt", "yuv420p", "-"],
        check=True, capture_output=True).stdout
    fsz = w * h * 3 // 2
    res = []
    for i in range(len(out) // fsz):
        raw = np.frombuffer(out[i * fsz:(i + 1) * fsz], np.uint8)
        res.append([raw[:w * h].reshape(h, w),
                    raw[w * h:w * h * 5 // 4].reshape(h // 2, w // 2),
                    raw[w * h * 5 // 4:].reshape(h // 2, w // 2)])
    return res


def _compare(path, w=W, h=H, maxdiff=3, min_psnr=50):
    ours = _ours(path)
    ref = _ref(path, w, h)
    assert len(ours) == len(ref), (len(ours), len(ref))
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi in range(3):
            a = np.asarray(o.planes[pi]).astype(np.int32)
            b = r[pi].astype(np.int32)
            d = np.abs(a - b).max()
            assert d <= maxdiff, f"frame {i} plane {pi} diff {d}"
        ay = np.asarray(o.planes[0]).astype(np.float64)
        err = np.mean((ay - ref[i][0]) ** 2)
        psnr = 10 * np.log10(255 ** 2 / max(err, 1e-9))
        assert psnr > min_psnr, f"frame {i} PSNR {psnr:.1f}"


@requires_ref
def test_mpeg4_intra_p(tmp_path):
    _compare(_make(tmp_path, "ip.avi", ["-q:v", "4", "-bf", "0",
                                        "-g", "5"]))


@requires_ref
def test_mpeg4_bframes(tmp_path):
    _compare(_make(tmp_path, "b.avi", ["-q:v", "4", "-bf", "2"],
                   frames=15))


@requires_ref
def test_mpeg4_4mv(tmp_path):
    _compare(_make(tmp_path, "mv4.avi",
                   ["-q:v", "4", "-flags", "+mv4"]))


@requires_ref
def test_mpeg4_mpeg_quant(tmp_path):
    _compare(_make(tmp_path, "mq.avi",
                   ["-q:v", "6", "-mpeg_quant", "1"]))


@requires_ref
def test_mpeg4_rate_control_dquant(tmp_path):
    # bitrate mode exercises per-MB dquant
    _compare(_make(tmp_path, "rc.avi", ["-b:v", "150k", "-bf", "1"],
                   frames=20))


@requires_ref
def test_mpeg4_qcif_unaligned(tmp_path):
    # dimensions not multiples of 16
    _compare(_make(tmp_path, "odd.avi", ["-q:v", "5"],
                   size="180x130"), w=180, h=130)


@requires_ref
def test_mpeg4_mov_container(tmp_path):
    p = tmp_path / "m.mp4"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "lavfi", "-i",
         f"testsrc2=size={W}x{H}:rate=25", "-frames:v", "8",
         "-c:v", "mpeg4", "-q:v", "4", "-y", str(p)], check=True)
    _compare(p)


@requires_ref
def test_h263_baseline(tmp_path):
    p = tmp_path / "h263.avi"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "lavfi", "-i",
         f"testsrc2=size={W}x{H}:rate=25", "-frames:v", "10",
         "-c:v", "h263", "-q:v", "5", "-y", str(p)], check=True)
    _compare(p)


@requires_ref
def test_h263_cif_rc(tmp_path):
    p = tmp_path / "h263cif.avi"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "lavfi", "-i",
         "testsrc2=size=352x288:rate=25", "-frames:v", "8",
         "-c:v", "h263", "-b:v", "400k", "-y", str(p)], check=True)
    _compare(p, w=352, h=288)
