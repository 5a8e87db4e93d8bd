"""ID3v2 reader tests (libavformat/id3v2.c scope): text frames,
COMM/TXXX, CHAP chapters, APIC, v2.3 + v2.4, syncsafe sizes."""

import struct

from ffmpeg_tpu.io import id3v2, open_input


def _syncsafe(v):
    return bytes([(v >> 21) & 0x7F, (v >> 14) & 0x7F,
                  (v >> 7) & 0x7F, v & 0x7F])


def _frame(fid, payload, ver=4):
    size = _syncsafe(len(payload)) if ver == 4 else \
        struct.pack(">I", len(payload))
    return fid.encode() + size + b"\x00\x00" + payload


def _tag(frames, ver=4):
    body = b"".join(frames)
    return b"ID3" + bytes([ver, 0, 0]) + _syncsafe(len(body)) + body


def _text(s, enc=3):
    if enc == 0:
        return bytes([0]) + s.encode("latin-1")
    return bytes([3]) + s.encode("utf-8")


def _chap(elem, start, end, title, ver=4):
    sub = _frame("TIT2", _text(title), ver)
    return (elem.encode() + b"\x00" + struct.pack(">II", start, end) +
            b"\xff\xff\xff\xff" * 2 + sub)


def test_id3v24_text_frames():
    tag = _tag([
        _frame("TIT2", _text("My Title")),
        _frame("TPE1", _text("Artist", enc=0)),
        _frame("TALB", _text("Album")),
        _frame("TRCK", _text("3/12")),
        _frame("TXXX", bytes([3]) + b"mykey\x00myval"),
        _frame("COMM", bytes([3]) + b"eng" + b"\x00" + b"hello comment"),
    ])
    meta, chapters, pics = id3v2.parse(tag)
    assert meta["title"] == "My Title"
    assert meta["artist"] == "Artist"
    assert meta["album"] == "Album"
    assert meta["track"] == "3/12"
    assert meta["mykey"] == "myval"
    assert meta["comment"] == "hello comment"
    assert chapters == [] and pics == []


def test_id3v23_sizes_not_syncsafe():
    tag = _tag([_frame("TIT2", _text("T" * 200), ver=3)], ver=3)
    meta, _, _ = id3v2.parse(tag)
    assert meta["title"] == "T" * 200


def test_id3_chapters():
    tag = _tag([
        _frame("TIT2", _text("Show")),
        _frame("CHAP", _chap("chp0", 0, 60000, "Intro")),
        _frame("CHAP", _chap("chp1", 60000, 180000, "Main part")),
    ])
    meta, chapters, _ = id3v2.parse(tag)
    assert meta["title"] == "Show"
    assert len(chapters) == 2
    assert chapters[0].element_id == "chp0"
    assert (chapters[0].start_ms, chapters[0].end_ms) == (0, 60000)
    assert chapters[0].metadata["title"] == "Intro"
    assert chapters[1].metadata["title"] == "Main part"


def test_id3_apic():
    img = b"\x89PNG fake image data"
    payload = bytes([0]) + b"image/png\x00" + bytes([3]) + \
        b"cover\x00" + img
    tag = _tag([_frame("APIC", payload)])
    _, _, pics = id3v2.parse(tag)
    assert pics == [("image/png", "cover", img)]


def _mp3_frames(n=4):
    # MPEG1 Layer III, 128 kbps, 44100 Hz → 417-byte frames
    hdr = b"\xff\xfb\x90\x00"
    return (hdr + b"\x00" * (417 - 4)) * n


def test_mp3_demuxer_reads_id3(tmp_path):
    tag = _tag([
        _frame("TIT2", _text("Tagged Song")),
        _frame("CHAP", _chap("c0", 0, 1000, "Part one")),
    ])
    p = str(tmp_path / "t.mp3")
    with open(p, "wb") as f:
        f.write(tag + _mp3_frames())
    d = open_input(p)
    assert d.metadata["title"] == "Tagged Song"
    assert d.chapters == [("c0", 0, 1000, {"title": "Part one"})]
    assert len(list(d.packets())) == 4


def test_ffprobe_show_chapters(tmp_path, capsys):
    import json
    from ffmpeg_tpu.cli.ffprobe import main
    tag = _tag([_frame("CHAP", _chap("c0", 500, 2500, "Ch"))])
    p = str(tmp_path / "t.mp3")
    with open(p, "wb") as f:
        f.write(tag + _mp3_frames())
    rc = main(["-show_chapters", "-of", "json", p])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    chs = out["chapters"]
    assert len(chs) == 1
    assert chs[0]["start"] == 500 and chs[0]["end"] == 2500
    assert chs[0]["tag:title"] == "Ch"
