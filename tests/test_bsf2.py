"""hevc_mp4toannexb / vp9_superframe(+split) BSFs and the hevc parser."""

from ffmpeg_tpu.codecs.bsf import get_bsf
from ffmpeg_tpu.codecs.parsers import get_parser
from ffmpeg_tpu.codecs.vp9 import split_superframe
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType


def _hvcc(ps_nals):
    """Minimal hvcC wrapping the given parameter-set NAL units."""
    ed = bytearray(b"\x01" + b"\x00" * 20)
    ed.append(0x03)                       # lengthSizeMinusOne=3 → 4-byte
    ed.append(len(ps_nals))               # numOfArrays
    for ntype, nal in ps_nals:
        ed.append(ntype)
        ed += (1).to_bytes(2, "big")
        ed += len(nal).to_bytes(2, "big")
        ed += nal
    return bytes(ed)


def _nal(ntype, payload):
    return bytes([(ntype << 1), 0x01]) + payload


def test_hevc_mp4toannexb():
    vps = _nal(32, b"\x0c\x01\xff\xff")
    sps = _nal(33, b"\x0c\x11")
    pps = _nal(34, b"\xc1")
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="hevc",
                          extradata=_hvcc([(32, vps), (33, sps), (34, pps)]))
    f = get_bsf("hevc_mp4toannexb", par)
    idr = _nal(19, b"\x80\x11\x22")       # IRAP slice
    trail = _nal(1, b"\x00\x33")
    data = len(idr).to_bytes(4, "big") + idr
    out = f.filter(Packet(data=data))[0]
    got = bytes(out.data)
    # PS prepended once, all NALs start-code framed
    assert got == (b"\x00\x00\x00\x01" + vps + b"\x00\x00\x00\x01" + sps +
                   b"\x00\x00\x00\x01" + pps + b"\x00\x00\x00\x01" + idr)
    data2 = len(trail).to_bytes(4, "big") + trail
    out2 = f.filter(Packet(data=data2))[0]
    assert bytes(out2.data) == b"\x00\x00\x00\x01" + trail


def test_hevc_mp4toannexb_ps_every_irap():
    """PS re-prepended before the first IRAP of EVERY packet (per-packet
    got_irap, bsf/hevc_mp4toannexb.c), skipped when PS arrive in-band."""
    vps = _nal(32, b"\x0c\x01")
    sps = _nal(33, b"\x0c\x11")
    pps = _nal(34, b"\xc1")
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="hevc",
                          extradata=_hvcc([(32, vps), (33, sps), (34, pps)]))
    f = get_bsf("hevc_mp4toannexb", par)
    idr = _nal(19, b"\x80\x11")
    sc = b"\x00\x00\x00\x01"

    def lp(*nals):
        return b"".join(len(n).to_bytes(4, "big") + n for n in nals)

    ps = sc + vps + sc + sps + sc + pps
    assert bytes(f.filter(Packet(data=lp(idr)))[0].data) == ps + sc + idr
    trail = _nal(1, b"\x00")
    assert bytes(f.filter(Packet(data=lp(trail)))[0].data) == sc + trail
    # second keyframe packet (seek/mid-stream join) gets PS again
    assert bytes(f.filter(Packet(data=lp(idr)))[0].data) == ps + sc + idr
    # packet already carrying PS NALs is not double-prefixed
    assert bytes(f.filter(Packet(data=lp(vps, sps, pps, idr)))[0].data) \
        == ps + sc + idr


def _vp9_frame(show_frame, frame_type=0, tail=b"\x55" * 9):
    b0 = (2 << 6) | (0 << 5) | (0 << 4) | (0 << 3) | \
        (frame_type << 2) | (show_frame << 1)
    return bytes([b0]) + tail


def test_vp9_superframe_merge_and_split():
    inv1 = _vp9_frame(0, 1, b"\x11" * 20)
    inv2 = _vp9_frame(0, 1, b"\x22" * 7)
    vis = _vp9_frame(1, 1, b"\x33" * 12)
    merge = get_bsf("vp9_superframe")
    assert merge.filter(Packet(data=inv1, pts=0)) == []
    assert merge.filter(Packet(data=inv2, pts=0)) == []
    out = merge.filter(Packet(data=vis, pts=1))
    assert len(out) == 1
    sf = bytes(out[0].data)
    # the decoder-side splitter must recover all three frames
    assert split_superframe(sf) == [inv1, inv2, vis]
    # and the split BSF mirrors it
    split = get_bsf("vp9_superframe_split")
    parts = split.filter(Packet(data=sf, pts=1, dts=1))
    assert [bytes(p.data) for p in parts] == [inv1, inv2, vis]
    assert parts[-1].pts == 1


def test_vp9_superframe_visible_passthrough():
    vis = _vp9_frame(1)
    merge = get_bsf("vp9_superframe")
    out = merge.filter(Packet(data=vis))
    assert len(out) == 1 and bytes(out[0].data) == vis


def test_hevc_parser_au_split():
    sc = b"\x00\x00\x00\x01"
    vps, sps, pps = _nal(32, b"\xff"), _nal(33, b"\xee"), _nal(34, b"\xdd")
    def au(i, nslices=2):
        parts = []
        if i == 0:
            parts += [sc + vps, sc + sps, sc + pps]
        parts.append(sc + _nal(19 if i == 0 else 1, bytes([0x80, i])))
        for s in range(nslices - 1):
            parts.append(sc + _nal(19 if i == 0 else 1, bytes([0x00, i, s])))
        return b"".join(parts)
    aus = [au(i) for i in range(4)]
    blob = b"".join(aus)
    p = get_parser("hevc")
    out = []
    for i in range(0, len(blob), 5):
        out += p.feed(blob[i:i + 5])
    out += p.flush()
    assert out == aus
