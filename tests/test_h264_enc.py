"""H.264 encoder tests: our Baseline I/P CAVLC encoder's streams must
decode identically in the reference binary and our decoder, with
reasonable quality and P-frame compression."""

import subprocess

import numpy as np
import pytest
from numpy.lib.stride_tricks import sliding_window_view

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType

W, H = 64, 48


def _smooth(a):
    out = a.astype(float)
    for _ in range(2):
        p = np.pad(out, 2, mode="edge")
        out = sliding_window_view(p, (5, 5)) \
            .reshape(*out.shape, 25).mean(-1)
    return out.astype(np.uint8)


def _source_frames(n=5, seed=0, w=W, h=H):
    rng = np.random.default_rng(seed)
    by = _smooth((rng.random((h * 2, w * 2)) * 255)
                 .astype(np.uint8))
    bu = _smooth((rng.random((h, w)) * 255).astype(np.uint8))
    bv = _smooth((rng.random((h, w)) * 255).astype(np.uint8))
    out = []
    for t in range(n):
        out.append(Frame.video(
            w, h, "yuv420p",
            planes=[by[t:t + h, 2 * t:2 * t + w].copy(),
                    bu[t // 2:t // 2 + h // 2, t:t + w // 2].copy(),
                    bv[t // 2:t // 2 + h // 2, t:t + w // 2].copy()],
            pts=t))
    return out


def _encode(frames, w=W, h=H, **opts):
    enc = CodecContext.open_encoder(
        CodecParameters(codec_type=MediaType.VIDEO,
                        codec_id="h264", width=w, height=h),
        options=opts)
    pkts = []
    for f in frames:
        pkts += enc.codec.encode(f)
    return pkts


def _ref_decode(data, tmp_path):
    p = tmp_path / "s.h264"
    p.write_bytes(data)
    out = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i",
         str(p), "-f", "rawvideo", "-"],
        check=True, capture_output=True).stdout
    return np.frombuffer(out, np.uint8)


def _our_decode(data):
    dec = CodecContext.open_decoder(
        CodecParameters(codec_type=MediaType.VIDEO,
                        codec_id="h264"))
    frames = dec.decode_all([Packet(data=data, pts=0)])
    return np.concatenate(
        [np.concatenate([np.asarray(p).ravel() for p in f.planes])
         for f in frames]), frames


@requires_ref
def test_h264_enc_gop_decodes_identically(tmp_path):
    frames = _source_frames(5)
    pkts = _encode(frames, qp=26)
    data = b"".join(p.data for p in pkts)
    want = _ref_decode(data, tmp_path)
    got, decoded = _our_decode(data)
    assert len(decoded) == 5
    np.testing.assert_array_equal(got, want)


@requires_ref
def test_h264_enc_quality_and_compression(tmp_path):
    frames = _source_frames(5)
    pkts = _encode(frames, qp=26)
    data = b"".join(p.data for p in pkts)
    want = _ref_decode(data, tmp_path)
    n = W * H * 3 // 2
    for t, f in enumerate(frames):
        src = np.concatenate([np.asarray(p).ravel()
                              for p in f.planes])
        d = want[t * n:(t + 1) * n].astype(float) - src
        psnr = 10 * np.log10(255 ** 2 / max(np.mean(d ** 2), 1e-9))
        assert psnr > 35, f"frame {t} psnr {psnr:.1f}"
    sizes = [len(p.data) for p in pkts]
    # translating content: P frames must be much smaller than the I
    assert all(s < sizes[0] // 3 for s in sizes[1:])


@requires_ref
@pytest.mark.parametrize("qp", [18, 30, 38])
def test_h264_enc_qp_sweep(tmp_path, qp):
    frames = _source_frames(3, seed=qp)
    data = b"".join(p.data for p in _encode(frames, qp=qp))
    want = _ref_decode(data, tmp_path)
    got, _ = _our_decode(data)
    np.testing.assert_array_equal(got, want)


@requires_ref
def test_h264_enc_static_scene_skips(tmp_path):
    """A fully static scene after the IDR: every P MB should be a
    skip, giving tiny packets."""
    f0 = _source_frames(1)[0]
    frames = [f0] + [
        Frame.video(W, H, "yuv420p",
                    planes=[np.asarray(p).copy() for p in f0.planes],
                    pts=t) for t in range(1, 4)]
    pkts = _encode(frames, qp=26)
    data = b"".join(p.data for p in pkts)
    want = _ref_decode(data, tmp_path)
    got, _ = _our_decode(data)
    np.testing.assert_array_equal(got, want)
    # early Ps carry a little quantization-error residual; the
    # stream converges to pure skip runs
    assert all(len(p.data) <= 40 for p in pkts[1:])
    assert len(pkts[-1].data) <= 12


@requires_ref
def test_h264_enc_idr_refresh(tmp_path):
    frames = _source_frames(6, seed=3)
    pkts = _encode(frames, qp=26, g=3)
    assert pkts[0].flags and pkts[3].flags       # IDR at 0 and 3
    data = b"".join(p.data for p in pkts)
    want = _ref_decode(data, tmp_path)
    got, _ = _our_decode(data)
    np.testing.assert_array_equal(got, want)


@requires_ref
def test_h264_enc_subpel_motion(tmp_path):
    """Half-pel panning content: sub-pel refinement must cut P-frame
    size versus full-pel ME, and still decode identically."""
    rng = np.random.default_rng(0)
    big = _smooth((rng.random((H * 2 + 32, W * 2 + 32)) * 255)
                  .astype(np.uint8)).astype(float)
    frames = []
    for t in range(4):
        y = big[t:t + 2 * H:2, t:t + 2 * W:2].astype(np.uint8)
        c = np.full((H // 2, W // 2), 128, np.uint8)
        frames.append(Frame.video(W, H, "yuv420p",
                                  planes=[y, c.copy(), c.copy()],
                                  pts=t))
    full = _encode(frames, qp=26, subpel=0)
    sub = _encode(frames, qp=26, subpel=2)
    assert sum(len(p.data) for p in sub[1:]) < \
        sum(len(p.data) for p in full[1:])
    data = b"".join(p.data for p in sub)
    want = _ref_decode(data, tmp_path)
    got, _ = _our_decode(data)
    np.testing.assert_array_equal(got, want)


@requires_ref
def test_h264_enc_cropped_size(tmp_path):
    """Non-MB-multiple dimensions use frame cropping."""
    frames = _source_frames(2, seed=5, w=60, h=44)
    pkts = _encode(frames, w=60, h=44, qp=26)
    data = b"".join(p.data for p in pkts)
    want = _ref_decode(data, tmp_path)
    got, decoded = _our_decode(data)
    assert decoded[0].width == 60 and decoded[0].height == 44
    np.testing.assert_array_equal(got, want)
