"""HDR static metadata plumbing: matroska Colour element
(CICP codes, mastering display, content light) read+write, decode
frame-prop fill, and tonemap signal-peak integration."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.filters.video5 import determine_signal_peak
from ffmpeg_tpu.io.demux import open_input
from ffmpeg_tpu.io.mux import open_output
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational

W, H = 64, 48

_MASTERING = {"rx": 0.708, "ry": 0.292, "gx": 0.170, "gy": 0.797,
              "bx": 0.131, "by": 0.046, "wx": 0.3127, "wy": 0.3290,
              "max_luminance": 1000.0, "min_luminance": 0.005}
_CLL = {"max_cll": 800, "max_fall": 200}


def _write_hdr_mkv(path):
    enc = CodecContext.open_encoder(CodecParameters(
        codec_type=MediaType.VIDEO, codec_id="mjpeg",
        width=W, height=H))
    f = Frame.video(
        W, H, "yuv420p",
        planes=[np.full((H, W), 128, np.uint8),
                np.full((H // 2, W // 2), 128, np.uint8),
                np.full((H // 2, W // 2), 128, np.uint8)], pts=0)
    pkt = enc.codec.encode(f)[0]
    par = CodecParameters(codec_type=MediaType.VIDEO,
                          codec_id="mjpeg", width=W, height=H)
    par.color_space = "bt2020nc"
    par.color_trc = "smpte2084"
    par.color_primaries = "bt2020"
    par.color_range = "tv"
    par.mastering_display = dict(_MASTERING)
    par.content_light = dict(_CLL)
    mux = open_output(str(path), format="matroska")
    mux.add_stream(codecpar=par, time_base=Rational(1, 25))
    mux.write_header()
    pkt.stream_index = 0
    pkt.time_base = Rational(1, 25)
    mux.write_packet(pkt)
    mux.write_trailer()


@requires_ref
def test_reference_reads_our_colour_tags(tmp_path):
    p = tmp_path / "hdr.mkv"
    _write_hdr_mkv(p)
    out = subprocess.run(
        [str(refutil.REF.parent / "ffprobe"), "-v", "error",
         "-show_streams", str(p)], capture_output=True) \
        .stdout.decode()
    assert "color_space=bt2020nc" in out
    assert "color_transfer=smpte2084" in out
    assert "color_primaries=bt2020" in out
    assert "color_range=tv" in out
    frames = subprocess.run(
        [str(refutil.REF.parent / "ffprobe"), "-v", "error",
         "-show_frames", str(p)], capture_output=True) \
        .stdout.decode()
    assert "Mastering display metadata" in frames
    assert "Content light level metadata" in frames


def test_roundtrip_and_frame_prop_fill(tmp_path):
    p = tmp_path / "hdr.mkv"
    _write_hdr_mkv(p)
    dmx = open_input(str(p))
    par = dmx.streams[0].codecpar
    assert par.color_space == "bt2020nc"
    assert par.color_trc == "smpte2084"
    assert par.color_primaries == "bt2020"
    assert par.color_range == "tv"
    assert par.mastering_display["max_luminance"] == \
        pytest.approx(1000.0)
    assert par.content_light == _CLL
    dec = CodecContext.open_decoder(par)
    dec.send_packet(dmx.read_packet())
    fr = dec.receive_frame()
    assert fr.color_trc == "smpte2084"
    assert fr.side_data["content_light_level"] == _CLL
    md = fr.side_data["mastering_display_metadata"]
    assert md["max_luminance"] == pytest.approx(1000.0)
    # tonemap peak: content light wins (800 nits / 100)
    assert determine_signal_peak(fr) == pytest.approx(8.0)
