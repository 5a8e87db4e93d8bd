"""tee + fifo muxer tests (reference: libavformat/tee.c, fifo.c)."""

import os
import time

import pytest

from ffmpeg_tpu.core.packet import Packet, PKT_FLAG_KEY
from ffmpeg_tpu.io import open_input
from ffmpeg_tpu.io.mux import Muxer, open_output, register_muxer
from ffmpeg_tpu.formats.channel_layout import default_layout
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.error import InvalidData
from ffmpeg_tpu.utils.rational import Rational


def _vpar():
    return CodecParameters(codec_type=MediaType.VIDEO, codec_id="rawvideo",
                           width=16, height=8, pix_fmt="gray")


def _apar():
    return CodecParameters(codec_type=MediaType.AUDIO, codec_id="pcm_s16le",
                           sample_rate=8000, ch_layout=default_layout(1),
                           sample_fmt="s16")


def _vpkt(i):
    return Packet(data=bytes([i]) * (16 * 8), pts=i, dts=i, stream_index=0,
                  time_base=Rational(1, 25), flags=PKT_FLAG_KEY)


def _apkt(i, idx=1):
    return Packet(data=bytes([0x80 + i]) * 64, pts=i * 32, dts=i * 32,
                  stream_index=idx, time_base=Rational(1, 8000),
                  flags=PKT_FLAG_KEY)


def test_tee_two_slaves_select(tmp_path):
    v = str(tmp_path / "out.avi")
    a = str(tmp_path / "out.wav")
    mux = open_output(f"[f=avi:select=v]{v}|[f=wav:select=a]{a}",
                      format="tee")
    mux.add_stream(_vpar(), time_base=Rational(1, 25))
    mux.add_stream(_apar(), time_base=Rational(1, 8000))
    mux.write_header()
    vp = [_vpkt(i) for i in range(5)]
    ap = [_apkt(i) for i in range(5)]
    for pv, pa in zip(vp, ap):
        mux.write_packet(pv)
        mux.write_packet(pa)
    mux.write_trailer()
    dv = open_input(v)
    assert dv.streams[0].codecpar.codec_type == MediaType.VIDEO
    assert [bytes(p.data) for p in dv.packets()] == \
        [bytes(p.data) for p in vp]
    da = open_input(a)
    assert da.streams[0].codecpar.codec_type == MediaType.AUDIO
    got = b"".join(bytes(p.data) for p in da.packets())
    assert got == b"".join(bytes(p.data) for p in ap)


def test_tee_onfail_ignore_bad_slave(tmp_path):
    good = str(tmp_path / "ok.avi")
    bad = str(tmp_path / "no-such-dir" / "x.avi")
    mux = open_output(
        f"[f=avi:onfail=ignore]{bad}|[f=avi]{good}", format="tee")
    mux.add_stream(_vpar(), time_base=Rational(1, 25))
    mux.write_header()
    for i in range(3):
        mux.write_packet(_vpkt(i))
    mux.write_trailer()
    assert os.path.exists(good)
    assert len(list(open_input(good).packets())) == 3


def test_tee_bad_slave_aborts_by_default(tmp_path):
    bad = str(tmp_path / "no-such-dir" / "x.avi")
    mux = open_output(f"[f=avi]{bad}", format="tee")
    mux.add_stream(_vpar(), time_base=Rational(1, 25))
    with pytest.raises((OSError, InvalidData)):
        mux.write_header()


def test_fifo_passthrough(tmp_path):
    out = str(tmp_path / "out.avi")
    mux = open_output(out, format="fifo", fifo_format="avi")
    mux.add_stream(_vpar(), time_base=Rational(1, 25))
    mux.write_header()
    pkts = [_vpkt(i) for i in range(10)]
    for p in pkts:
        mux.write_packet(p)
    mux.write_trailer()
    got = [bytes(p.data) for p in open_input(out).packets()]
    assert got == [bytes(p.data) for p in pkts]


_FLAKY_SINK = {"fails_left": 0, "written": [], "headers": 0}


@register_muxer
class _FlakyMuxer(Muxer):
    """Test-only sink that fails the first N packet writes."""

    name = "_flaky_test"
    interleave = False

    def _write_header(self) -> None:
        _FLAKY_SINK["headers"] += 1

    def _write_packet(self, pkt) -> None:
        if _FLAKY_SINK["fails_left"] > 0:
            _FLAKY_SINK["fails_left"] -= 1
            raise InvalidData("flaky sink down")
        _FLAKY_SINK["written"].append(bytes(pkt.data))


def test_fifo_attempt_recovery(tmp_path):
    _FLAKY_SINK.update(fails_left=3, written=[], headers=0)
    out = str(tmp_path / "sink.bin")
    mux = open_output(out, format="fifo", fifo_format="_flaky_test",
                      attempt_recovery=True, recovery_wait_time=0.01,
                      max_recovery_attempts=10)
    mux.add_stream(_vpar(), time_base=Rational(1, 25))
    mux.write_header()
    pkts = [_vpkt(i) for i in range(6)]
    for p in pkts:
        mux.write_packet(p)
    mux.write_trailer()
    # every packet eventually lands despite 3 failures, via reopens
    assert _FLAKY_SINK["written"] == [bytes(p.data) for p in pkts]
    assert _FLAKY_SINK["headers"] > 1           # recovery reopened the sink
    assert mux._recoveries == 3


def test_fifo_max_recovery_attempts_exceeded(tmp_path):
    _FLAKY_SINK.update(fails_left=100, written=[], headers=0)
    out = str(tmp_path / "sink.bin")
    mux = open_output(out, format="fifo", fifo_format="_flaky_test",
                      attempt_recovery=True, recovery_wait_time=0.005,
                      max_recovery_attempts=2)
    mux.add_stream(_vpar(), time_base=Rational(1, 25))
    mux.write_header()
    mux.write_packet(_vpkt(0))
    with pytest.raises(InvalidData):
        for _ in range(100):            # give the thread time to fail
            mux.write_packet(_vpkt(1))
            time.sleep(0.005)
        mux.write_trailer()


def test_fifo_drop_on_overflow(tmp_path):
    _FLAKY_SINK.update(fails_left=0, written=[], headers=0)
    out = str(tmp_path / "sink.bin")
    mux = open_output(out, format="fifo", fifo_format="_flaky_test",
                      queue_size=2, drop_pkts_on_overflow=True)
    mux.add_stream(_vpar(), time_base=Rational(1, 25))
    mux.write_header()
    for i in range(50):
        mux.write_packet(_vpkt(i % 200))
    mux.write_trailer()                 # must not deadlock
    assert len(_FLAKY_SINK["written"]) <= 50
