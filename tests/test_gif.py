"""GIF codec + container tests (codecs/gif.py, io/formats/gif.py)."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs.gif import lzw_decode, lzw_encode, _web_palette, _quantize
from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.io import open_input, open_output
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational


def test_lzw_roundtrip():
    rng = np.random.default_rng(0)
    for n, alphabet in ((1000, 256), (5000, 16), (64, 4)):
        idx = rng.integers(0, alphabet, n).astype(np.uint8)
        mcs = max(2, int(np.ceil(np.log2(alphabet))))
        enc = lzw_encode(idx, mcs)
        dec = lzw_decode(enc, mcs, n)
        np.testing.assert_array_equal(dec, idx)
        # random data can expand (12-bit codes max); bound the blowup
        assert len(enc) < n * 1.6 + 16


def test_quantize_palette_consistency():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    idx = _quantize(rgb)
    back = _web_palette()[idx]
    err = np.abs(back.astype(int) - rgb.astype(int))
    assert err.max() <= 26          # half a 6/7-level step


def _rgb_frames(n=3, w=64, h=48):
    rng = np.random.default_rng(2)
    frames = []
    for i in range(n):
        # smooth gradient + moving box (quantization-friendly content)
        yy, xx = np.mgrid[0:h, 0:w]
        r = (xx * 255 // w).astype(np.uint8)
        g = (yy * 255 // h).astype(np.uint8)
        b = np.full((h, w), 40 * i, np.uint8)
        r[10:20, 10 + 8 * i:20 + 8 * i] = 255
        f = Frame.video(w, h, "rgb24", planes=[r, g, b], pts=i * 10,
                        time_base=Rational(1, 100))
        f.duration = 10
        frames.append(f)
    return frames


def _encode_gif(path, frames):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="gif",
                          width=frames[0].width, height=frames[0].height)
    enc = CodecContext.open_encoder(par)
    m = open_output(str(path), format="gif")
    m.add_stream(par, time_base=Rational(1, 100))
    for f in frames:
        enc.send_frame(f)
        for pkt in _drain_pkts(enc):
            pkt.stream_index = 0
            m.write_packet(pkt)
    enc.send_frame(None)
    for pkt in _drain_pkts(enc):
        pkt.stream_index = 0
        m.write_packet(pkt)
    m.write_trailer()
    m.close()


def _drain_pkts(enc):
    from ffmpeg_tpu.utils.error import EndOfStream, TryAgain
    while True:
        try:
            yield enc.receive_packet()
        except (TryAgain, EndOfStream):
            return


def test_gif_encode_decode_roundtrip(tmp_path):
    p = tmp_path / "t.gif"
    frames = _rgb_frames()
    _encode_gif(p, frames)
    assert p.read_bytes()[:6] == b"GIF89a"

    d = open_input(str(p))
    assert d.name == "gif"
    assert d.streams[0].codecpar.width == 64
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    out = dec.decode_all(d.packets())
    assert len(out) == 3
    assert out[0].format == "rgba"
    for fin, fout in zip(frames, out):
        for c in range(3):
            a = np.asarray(fin.planes[c]).astype(int)
            b = np.asarray(fout.planes[c]).astype(int)
            assert np.abs(a - b).max() <= 26   # half a palette step
    assert out[1].pts == 10


@requires_ref
def test_reference_decodes_our_gif(tmp_path):
    if b"gif" not in subprocess.run(
            [str(refutil.REF), "-hide_banner", "-decoders"],
            capture_output=True).stdout:
        pytest.skip("reference build lacks gif")
    p = tmp_path / "t.gif"
    _encode_gif(p, _rgb_frames())
    r = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(p), "-f", "framecrc", "-"],
        capture_output=True)
    assert r.returncode == 0 and r.stderr == b""
    assert len([l for l in r.stdout.splitlines() if l.startswith(b"0,")]) == 3


@requires_ref
def test_decode_reference_gif(tmp_path):
    if b"gif" not in subprocess.run(
            [str(refutil.REF), "-hide_banner", "-encoders"],
            capture_output=True).stdout:
        pytest.skip("reference build lacks gif")
    p = tmp_path / "ref.gif"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", "testsrc2=size=96x64:rate=10", "-frames:v", "4",
                    "-y", str(p)], check=True, capture_output=True)
    d = open_input(str(p))
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    ours = dec.decode_all(d.packets())
    assert len(ours) == 4
    # compare against reference's own decode to rgba rawvideo
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(p), "-pix_fmt", "rgba",
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    ref = np.frombuffer(raw, np.uint8).reshape(4, 64, 96, 4)
    for i, f in enumerate(ours):
        got = np.stack([np.asarray(pl) for pl in f.planes], -1)
        np.testing.assert_array_equal(got, ref[i])
