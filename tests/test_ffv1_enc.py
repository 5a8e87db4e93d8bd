"""FFV1 encoder tests: our encode must (a) roundtrip byte-exact through
our own decoder (lossless) and (b) decode byte-exact with the REFERENCE
decoder (interop — the reference reads our v1 header + range-coded
stream; ffv1enc.c / rangecoder.c semantics)."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io import open_output
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational

W, H = 96, 64


def _frames(fmt, bits, shifts, nplanes, nframes=3, seed=3):
    rng = np.random.default_rng(seed)
    dt = np.uint8 if bits <= 8 else np.uint16
    mx = (1 << bits) - 1
    ch, cv = shifts
    cw, chh = -(-W >> ch), -(-H >> cv)
    out = []
    for i in range(nframes):
        planes = []
        for p in range(nplanes):
            sub = p in (1, 2) and shifts != (0, 0) and not fmt.startswith("gbr")
            w, h = (cw, chh) if sub else (W, H)
            # smooth gradient + noise: exercises both run-y and noisy ctxs
            base = (np.arange(w)[None, :] + np.arange(h)[:, None] * 2
                    + i * 17) % (mx + 1)
            noise = rng.integers(0, max(mx // 8, 2), (h, w))
            planes.append(((base + noise) & mx).astype(dt))
        out.append(Frame.video(W, H, fmt, planes=planes, pts=i,
                               time_base=Rational(1, 25)))
    return out


_CASES = [
    ("yuv420p", 8, (1, 1), 3),
    ("yuv422p", 8, (1, 0), 3),
    ("yuv444p", 8, (0, 0), 3),
    ("yuva420p", 8, (1, 1), 4),
    ("yuv420p10le", 10, (1, 1), 3),
    ("yuv444p16le", 16, (0, 0), 3),
    ("gray", 8, (0, 0), 1),
    ("gbrp", 8, (0, 0), 3),
    ("gbrap", 8, (0, 0), 4),
    ("gbrp12le", 12, (0, 0), 3),
]


def _encode(frames, fmt):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="ffv1",
                          width=W, height=H, pix_fmt=fmt)
    enc = CodecContext.open_encoder(par)
    return [enc.codec.encode(f)[0] for f in frames]


@pytest.mark.parametrize("fmt,bits,shifts,nplanes", _CASES,
                         ids=[c[0] for c in _CASES])
def test_own_roundtrip(fmt, bits, shifts, nplanes):
    frames = _frames(fmt, bits, shifts, nplanes)
    pkts = _encode(frames, fmt)
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="ffv1",
                          width=W, height=H)
    dec = CodecContext.open_decoder(par)
    for f, pkt in zip(frames, pkts):
        out = dec.codec.decode(pkt)
        assert len(out) == 1
        for p_in, p_out in zip(f.planes, out[0].planes):
            assert np.array_equal(np.asarray(p_in), np.asarray(p_out))


@requires_ref
@pytest.mark.parametrize("fmt,bits,shifts,nplanes", _CASES,
                         ids=[c[0] for c in _CASES])
def test_reference_decodes_ours(fmt, bits, shifts, nplanes, tmp_path):
    frames = _frames(fmt, bits, shifts, nplanes)
    pkts = _encode(frames, fmt)
    path = tmp_path / "ours.avi"
    m = open_output(str(path), format="avi")
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="ffv1",
                          width=W, height=H, pix_fmt=fmt,
                          framerate=Rational(25, 1))
    m.add_stream(par, time_base=Rational(1, 25))
    for pkt in pkts:
        pkt.stream_index = 0
        m.write_packet(pkt)
    m.write_trailer()
    m.close()
    ref_fmt = "gray" if fmt == "gray" else fmt
    ref = subprocess.run(
        [str(refutil.REF), "-v", "error", "-nostdin", "-i", str(path),
         "-f", "rawvideo", "-pix_fmt", ref_fmt, "-"],
        check=True, capture_output=True).stdout
    ours = b"".join(np.ascontiguousarray(p).tobytes()
                    for f in frames for p in f.planes)
    assert len(ref) == len(ours)
    assert ref == ours
