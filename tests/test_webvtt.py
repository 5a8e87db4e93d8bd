"""WebVTT demuxer/muxer/codec tests (webvttdec.c / webvttenc.c scope)."""

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.io import open_input
from ffmpeg_tpu.io.mux import open_output

VTT = """WEBVTT - sample

NOTE a comment block
spanning two lines

STYLE
::cue { color: lime }

intro
00:00:01.000 --> 00:00:03.500 align:start position:10%
Hello <b>world</b> &amp;友達

00:01:00.250 --> 01:00:02.000
Second cue
with two lines
"""


def _write(tmp_path):
    p = str(tmp_path / "t.vtt")
    with open(p, "w", encoding="utf-8") as f:
        f.write(VTT)
    return p


def test_webvtt_demux(tmp_path):
    d = open_input(_write(tmp_path))
    st = d.streams[0]
    assert st.codecpar.codec_id == "webvtt"
    pkts = list(d.packets())
    assert len(pkts) == 2
    assert pkts[0].pts == 1000 and pkts[0].duration == 2500
    assert pkts[0].side_data["webvtt_identifier"] == b"intro"
    assert bytes(pkts[1].data) == "Second cue\nwith two lines".encode()
    assert pkts[1].pts == 60250 and pkts[1].duration == 3602000 - 60250


def test_webvtt_decode_strips_markup(tmp_path):
    d = open_input(_write(tmp_path))
    pkts = list(d.packets())
    ctx = CodecContext.open_decoder(d.streams[0].codecpar)
    f = ctx.codec.decode(pkts[0])[0]
    assert f.side_data["text"] == "Hello world &友達"


def test_webvtt_mux_roundtrip(tmp_path):
    src = _write(tmp_path)
    d = open_input(src)
    pkts = list(d.packets())
    out = str(tmp_path / "rt.vtt")
    m = open_output(out, format="webvtt")
    m.add_stream(d.streams[0].codecpar, time_base=d.streams[0].time_base)
    for p in pkts:
        m.write_packet(p)
    m.write_trailer()
    m.close()
    d2 = open_input(out)
    got = [(p.pts, p.duration, bytes(p.data),
            p.side_data.get("webvtt_identifier"))
           for p in d2.packets()]
    want = [(p.pts, p.duration, bytes(p.data),
             p.side_data.get("webvtt_identifier")) for p in pkts]
    assert got == want


def test_webvtt_to_srt_codec_bridge(tmp_path):
    """vtt cue → decode → re-encode as subrip → srt muxer."""
    d = open_input(_write(tmp_path))
    pkts = list(d.packets())
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    from ffmpeg_tpu.io.stream import CodecParameters, MediaType
    enc_par = CodecParameters(codec_type=MediaType.SUBTITLE,
                              codec_id="subrip")
    enc = CodecContext.open_encoder(enc_par)
    out = str(tmp_path / "out.srt")
    m = open_output(out, format="srt")
    m.add_stream(enc_par, time_base=d.streams[0].time_base)
    for p in pkts:
        for f in dec.codec.decode(p):
            for op in enc.codec.encode(f):
                op.stream_index = 0
                m.write_packet(op)
    m.write_trailer()
    m.close()
    d2 = open_input(out)
    assert d2.streams[0].codecpar.codec_id == "subrip"
    texts = [bytes(p.data).decode() for p in d2.packets()]
    assert texts[0] == "Hello world &友達"


def test_webvtt_in_matroska(tmp_path):
    d = open_input(_write(tmp_path))
    pkts = list(d.packets())
    out = str(tmp_path / "s.mkv")
    m = open_output(out, format="matroska")
    m.add_stream(d.streams[0].codecpar, time_base=d.streams[0].time_base)
    for p in pkts:
        m.write_packet(p)
    m.write_trailer()
    m.close()
    d2 = open_input(out)
    assert d2.streams[0].codecpar.codec_id == "webvtt"
    assert [bytes(p.data) for p in d2.packets()] == \
        [bytes(p.data) for p in pkts]


def test_webvtt_settings_side_data_and_remux(tmp_path):
    """Cue settings survive demux → side data → mux (AV_PKT_DATA_WEBVTT_SETTINGS)."""
    d = open_input(_write(tmp_path))
    pkts = list(d.packets())
    assert pkts[0].side_data["webvtt_settings"] == b"align:start position:10%"
    assert "webvtt_settings" not in pkts[1].side_data
    out = str(tmp_path / "settings.vtt")
    m = open_output(out, format="webvtt")
    m.add_stream(d.streams[0].codecpar, time_base=d.streams[0].time_base)
    for p in pkts:
        m.write_packet(p)
    m.write_trailer()
    m.close()
    txt = open(out, encoding="utf-8").read()
    assert "00:00:01.000 --> 00:00:03.500 align:start position:10%" in txt
