"""ASS/SSA subtitle tests: the reference converts SRT↔ASS as the
oracle; our demux/decode/encode/mux must agree on cue timing and
text, and the reference must read the .ass files we write."""

import subprocess

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.io import open_input, open_output

SRT = """1
00:00:01,000 --> 00:00:03,500
Hello <i>world</i>

2
00:00:04,000 --> 00:00:06,000
Second line
with a break

3
00:01:02,250 --> 00:01:04,750
{\\an8}Styled {bold} text
"""


def _mk_ass(tmp_path):
    srt = tmp_path / "s.srt"
    srt.write_text(SRT)
    ass = tmp_path / "s.ass"
    subprocess.run([str(refutil.REF), "-v", "error", "-i", str(srt),
                    "-y", str(ass)], check=True)
    return ass


def _decode_all(path):
    d = open_input(str(path))
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    return d, dec.decode_all(list(d.packets()))


@requires_ref
def test_ass_demux_decode(tmp_path):
    ass = _mk_ass(tmp_path)
    d, frames = _decode_all(ass)
    assert d.streams[0].codecpar.codec_id == "ass"
    assert b"[Script Info]" in bytes(d.streams[0].codecpar.extradata)
    assert len(frames) == 3
    texts = [f.side_data["text"] for f in frames]
    assert texts[0] == "Hello world"
    assert texts[1] == "Second line\nwith a break"
    assert "Styled" in texts[2] and "{" not in texts[2]
    # centisecond timing
    assert frames[0].pts == 100 and frames[0].duration == 250
    assert frames[2].pts == 6225 and frames[2].duration == 250


@requires_ref
def test_ass_mux_ref_readable(tmp_path):
    """Demux reference .ass → remux with our muxer → the reference
    converts it back to SRT with identical cues."""
    ass = _mk_ass(tmp_path)
    d = open_input(str(ass))
    out = tmp_path / "o.ass"
    m = open_output(str(out), format="ass")
    m.add_stream(d.streams[0].codecpar,
                 time_base=d.streams[0].time_base)
    for pkt in d.packets():
        m.write_packet(pkt)
    m.write_trailer()
    ref_srt = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(ass), "-f", "srt",
         "-"], check=True, capture_output=True).stdout
    our_srt = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(out), "-f", "srt",
         "-"], check=True, capture_output=True).stdout
    assert our_srt == ref_srt


@requires_ref
def test_srt_to_ass_chain(tmp_path):
    """SRT → our decode → our ASS encode → our muxer; reference reads
    the result and preserves the text."""
    srt = tmp_path / "s.srt"
    srt.write_text(SRT)
    d = open_input(str(srt))
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    frames = dec.decode_all(list(d.packets()))
    from ffmpeg_tpu.io.stream import CodecParameters, MediaType
    par = CodecParameters(codec_type=MediaType.SUBTITLE,
                          codec_id="ass")
    enc = CodecContext.open_encoder(par)
    out = tmp_path / "o.ass"
    m = open_output(str(out), format="ass")
    st = m.add_stream(par, time_base=d.streams[0].time_base)
    for f in frames:
        enc.send_frame(f)
        pkt = enc.receive_packet()
        pkt.stream_index = 0
        m.write_packet(pkt)
    m.write_trailer()
    got = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(out), "-f", "srt",
         "-"], check=True, capture_output=True).stdout.decode()
    assert "Hello world" in got.replace("<i>", "").replace("</i>", "")
    assert "Second line" in got and "with a break" in got
