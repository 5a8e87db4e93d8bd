"""concat: / subfile, / cache: / async: nested protocols
(libavformat/concat.c, subfile.c, cache.c, async.c scope)."""

import threading

from ffmpeg_tpu.io import open_input
from ffmpeg_tpu.io.avio import open_read
from ffmpeg_tpu.io.protocols import (AsyncStream, CacheStream,
                                     ConcatStream, SubfileStream)


def _files(tmp_path):
    a = tmp_path / "a.bin"
    b = tmp_path / "b.bin"
    a.write_bytes(bytes(range(100)))
    b.write_bytes(bytes(range(100, 200)))
    return str(a), str(b)


def test_concat_read_and_seek(tmp_path):
    a, b = _files(tmp_path)
    r = open_read(f"concat:{a}|{b}")
    assert r.size == 200
    assert r.read(150) == bytes(range(150))
    r.seek(90)
    assert r.read(20) == bytes(range(90, 110))
    assert r.read(1000) == bytes(range(110, 200))


def test_subfile_window(tmp_path):
    a, _ = _files(tmp_path)
    r = open_read(f"subfile,,start,10,end,60,,:{a}")
    assert r.size == 50
    assert r.read(50) == bytes(range(10, 60))
    assert r.read(10) == b""
    r.seek(5)
    assert r.read(5) == bytes(range(15, 20))


def test_subfile_end_zero_means_eof(tmp_path):
    a, _ = _files(tmp_path)
    r = open_read(f"subfile,,start,95,end,0,,:{a}")
    assert r.read(100) == bytes(range(95, 100))


def test_cache_backward_seek_over_pipe_like(tmp_path):
    a, _ = _files(tmp_path)

    class OneWay:
        """read-only, unseekable wrapper"""
        def __init__(self, p):
            self._f = open(p, "rb")
        def read(self, n=-1):
            return self._f.read(n)
        def close(self):
            self._f.close()

    cs = CacheStream.__new__(CacheStream)
    cs._f = OneWay(a)
    cs._cache = bytearray()
    cs._pos = 0
    cs.size = None
    assert cs.read(30) == bytes(range(30))
    cs.seek(10)
    assert cs.read(30) == bytes(range(10, 40))
    cs.seek(0)
    assert cs.read(5) == bytes(range(5))
    cs.close()


def test_cache_via_url(tmp_path):
    a, _ = _files(tmp_path)
    r = open_read(f"cache:{a}")
    assert r.read(50) == bytes(range(50))


def test_async_readahead(tmp_path):
    big = tmp_path / "big.bin"
    payload = bytes(range(256)) * 4096          # 1 MiB
    big.write_bytes(payload)
    r = open_read(f"async:{big}")
    out = bytearray()
    while True:
        c = r.read(65536)
        if not c:
            break
        out += c
    assert bytes(out) == payload
    r.close()


def test_nested_composition(tmp_path):
    """cache: over concat: — protocols compose like the reference."""
    a, b = _files(tmp_path)
    r = open_read(f"cache:concat:{a}|{b}")
    assert r.read(200) == bytes(range(200))


def test_demux_through_concat(tmp_path):
    """A media file split at an arbitrary byte boundary demuxes whole
    through concat: (the reference's classic use)."""
    import subprocess, sys, os
    # craft a wav via our own muxer
    from ffmpeg_tpu.io.mux import open_output
    from ffmpeg_tpu.io.stream import CodecParameters, MediaType
    from ffmpeg_tpu.formats.channel_layout import default_layout
    from ffmpeg_tpu.core.packet import Packet
    from ffmpeg_tpu.utils.rational import Rational
    wav = str(tmp_path / "t.wav")
    par = CodecParameters(codec_type=MediaType.AUDIO,
                          codec_id="pcm_s16le", sample_rate=8000,
                          ch_layout=default_layout(1), sample_fmt="s16")
    m = open_output(wav, format="wav")
    m.add_stream(par, time_base=Rational(1, 8000))
    m.write_header()
    m.write_packet(Packet(data=bytes(1600), pts=0, dts=0, stream_index=0,
                          time_base=Rational(1, 8000)))
    m.write_trailer()
    m.close()
    blob = open(wav, "rb").read()
    p1, p2 = tmp_path / "p1", tmp_path / "p2"
    p1.write_bytes(blob[:37])
    p2.write_bytes(blob[37:])
    d = open_input(f"concat:{p1}|{p2}")
    assert d.streams[0].codecpar.codec_id == "pcm_s16le"
    total = sum(len(p.data) for p in d.packets())
    assert total == 1600
