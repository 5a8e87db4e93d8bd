"""PPM/BMP codecs and source filters."""

import numpy as np

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.filters import get_filter
from ffmpeg_tpu.io.stream import CodecParameters, MediaType


def _par(codec):
    return CodecParameters(codec_type=MediaType.VIDEO, codec_id=codec)


def _src(w=64, h=48):
    rng = np.random.default_rng(0)
    return Frame.video(w, h, "rgb24",
                       planes=[rng.integers(0, 256, (h, w)).astype(np.uint8)
                               for _ in range(3)])


def test_ppm_roundtrip():
    src = _src()
    enc = CodecContext.open_encoder(_par("ppm"))
    enc.send_frame(src)
    pkt = enc.receive_packet()
    assert pkt.data.startswith(b"P6")
    (back,) = CodecContext.open_decoder(_par("ppm")).decode_all([pkt])
    for a, b in zip(src.planes, back.planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bmp_roundtrip():
    src = _src()
    enc = CodecContext.open_encoder(_par("bmp"))
    enc.send_frame(src)
    pkt = enc.receive_packet()
    assert pkt.data.startswith(b"BM")
    (back,) = CodecContext.open_decoder(_par("bmp")).decode_all([pkt])
    for a, b in zip(src.planes, back.planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pgm_gray():
    rng = np.random.default_rng(1)
    src = Frame.video(32, 16, "gray",
                      planes=[rng.integers(0, 256, (16, 32)).astype(np.uint8)])
    enc = CodecContext.open_encoder(_par("ppm"))
    enc.send_frame(src)
    pkt = enc.receive_packet()
    assert pkt.data.startswith(b"P5")
    (back,) = CodecContext.open_decoder(_par("ppm")).decode_all([pkt])
    np.testing.assert_array_equal(np.asarray(src.planes[0]),
                                  np.asarray(back.planes[0]))


def test_sources():
    frames = list(get_filter("testsrc")("size=64x48").generate(3))
    assert len(frames) == 3 and frames[0].width == 64
    # deterministic
    f2 = list(get_filter("testsrc")("size=64x48").generate(3))
    np.testing.assert_array_equal(np.asarray(frames[2].planes[0]),
                                  np.asarray(f2[2].planes[0]))
    color = list(get_filter("color")("red:size=32x32").generate(1))
    assert np.asarray(color[0].planes[0])[0, 0] == 255
    assert np.asarray(color[0].planes[1])[0, 0] == 0
    sine = list(get_filter("sine")("frequency=1000").generate(2))
    assert sine[0].sample_rate == 44100
    assert abs(float(np.abs(sine[0].audio_data).max()) - 0.5) < 0.01
