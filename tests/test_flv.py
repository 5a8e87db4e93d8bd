"""FLV container: our muxer validated by the reference's FLV demuxer
(this reference build ships the flv demuxer but not the muxer/encoder,
so generation goes through our side) and our demuxer round-trips.
Reference format logic: libavformat/flvdec.c, flvenc.c."""

import subprocess
import wave
import zlib

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.filters import get_filter
from ffmpeg_tpu.io import open_input, open_output
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.formats.channel_layout import default_layout
from ffmpeg_tpu.utils.rational import Rational


def _make_aac_flv(tmp_path):
    """Encode a sine with our AAC encoder and mux into FLV."""
    f = tmp_path / "t.flv"
    par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="aac",
                          sample_rate=44100, sample_fmt="fltp",
                          ch_layout=default_layout(1))
    enc = CodecContext.open_encoder(par)
    m = open_output(str(f), format="flv")
    opar = par.copy()
    # AudioSpecificConfig: object type 2 (LC), sr_index for 44100 = 4,
    # channel config 1 — FLV carries raw AAC + ASC, not ADTS
    opar.extradata = bytes([(2 << 3) | (4 >> 1), ((4 & 1) << 7) | (1 << 3)])
    m.add_stream(opar, time_base=Rational(1, 44100))

    def strip_adts(data):
        return data[9:] if data[1] & 1 == 0 else data[7:]
    pos = 0
    for fr in get_filter("sine")(
            "frequency=440:sample_rate=44100").generate(45):
        enc.send_frame(fr)
        while True:
            try:
                pkt = enc.receive_packet()
            except Exception:
                break
            pkt.stream_index = 0
            pkt.data = strip_adts(pkt.data)
            m.write_packet(pkt)
    enc.send_frame(None)
    while True:
        try:
            pkt = enc.receive_packet()
        except Exception:
            break
        pkt.stream_index = 0
        pkt.data = strip_adts(pkt.data)
        m.write_packet(pkt)
    m.write_trailer()
    m.close()
    return f


def _make_pcm_flv(tmp_path):
    f = tmp_path / "p.flv"
    par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="pcm_s16le",
                          sample_rate=44100, sample_fmt="s16",
                          ch_layout=default_layout(1), block_align=2,
                          bits_per_coded_sample=16)
    m = open_output(str(f), format="flv")
    m.add_stream(par, time_base=Rational(1, 44100))
    for fr in get_filter("sine")(
            "frequency=440:sample_rate=44100").generate(43):
        pcm = np.clip(np.asarray(fr.planes[0]).reshape(-1) * 32767,
                      -32768, 32767).astype("<i2").tobytes()
        m.write_packet(Packet(data=pcm, pts=fr.pts, dts=fr.pts,
                              stream_index=0, duration=1024,
                              time_base=Rational(1, 44100)))
    m.write_trailer()
    m.close()
    return f


@requires_ref
def test_flv_mux_aac_reference_decodes(tmp_path):
    """The reference must demux+decode our AAC FLV to a clean sine."""
    f = _make_aac_flv(tmp_path)
    refw = tmp_path / "ref.wav"
    pr = subprocess.run([str(refutil.REF), "-v", "error", "-i", str(f),
                         "-y", str(refw)], capture_output=True)
    assert pr.returncode == 0, pr.stderr[:400]
    w = wave.open(str(refw))
    x = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    assert w.getframerate() == 44100
    assert len(x) > 40000
    # spectral check: dominant bin at 440 Hz
    seg = x[8000:8000 + 16384].astype(np.float64)
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak = np.argmax(spec) * 44100 / len(seg)
    assert abs(peak - 440) < 10, peak


@requires_ref
def test_flv_mux_pcm_reference_parity(tmp_path):
    """PCM FLV: reference-demuxed payload equals what we wrote."""
    f = _make_pcm_flv(tmp_path)
    ref = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(f), "-c", "copy",
         "-fflags", "+bitexact", "-f", "framecrc", "-"],
        check=True, capture_output=True, text=True).stdout
    rows = [l.split(", ") for l in ref.splitlines() if l and l[0].isdigit()]
    total_ref = sum(int(r[4]) for r in rows)
    assert total_ref == 43 * 1024 * 2


def test_flv_roundtrip_own_demuxer(tmp_path):
    f = _make_pcm_flv(tmp_path)
    d = open_input(str(f))
    assert d.name == "flv"
    st = d.streams[0]
    assert st.codecpar.codec_id == "pcm_s16le"
    assert st.codecpar.sample_rate == 44100
    pk = list(d.packets())
    assert len(pk) == 43
    assert all(len(p.data) == 2048 for p in pk)
    # ms timestamps: frame i starts at i*1024 samples
    assert pk[1].pts == 1024 * 1000 // 44100


def test_flv_aac_roundtrip_own_stack(tmp_path):
    """our AAC enc → our FLV mux → our FLV demux → our AAC dec."""
    f = _make_aac_flv(tmp_path)
    d = open_input(str(f))
    st = d.streams[0]
    assert st.codecpar.codec_id == "aac"
    assert len(st.codecpar.extradata) >= 2
    assert st.codecpar.sample_rate == 44100
    dec = CodecContext.open_decoder(st.codecpar)
    n = 0
    for p in d.packets():
        dec.send_packet(p)
        while True:
            try:
                fr = dec.receive_frame()
            except Exception:
                break
            n += fr.nb_samples
    assert n > 40000


def test_flv_metadata_roundtrip(tmp_path):
    f = _make_pcm_flv(tmp_path)
    d = open_input(str(f))
    # onMetaData written by our muxer and parsed by our demuxer
    assert d._meta.get("audiosamplerate") == 44100.0
