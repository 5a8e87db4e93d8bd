"""HEVC CBS read/edit/write + metadata BSFs (cbs_h265 / h265_metadata /
av1_metadata / dts2pts scope)."""

import json
import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs.bsf import get_bsf
from ffmpeg_tpu.codecs.cbs import HevcCodedBitstream
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType


def _nals(annexb: bytes):
    import re
    ms = list(re.finditer(b"\x00\x00\x00\x01", annexb))
    out = []
    for i, m in enumerate(ms):
        end = ms[i + 1].start() if i + 1 < len(ms) else len(annexb)
        out.append(annexb[m.end():end])
    return out


def _crafted_stream(seed=1, n_frames=2):
    import test_hevc as TH
    rng = np.random.default_rng(seed)
    stream, _ = TH.craft_gop(lambda: TH.InterPlan(rng), n_frames=n_frames)
    return stream


def test_cbs_hevc_roundtrip_bit_exact():
    """read->write of VPS/SPS/PPS reproduces the unit byte-for-byte."""
    import test_hevc as TH
    units = []
    units += _nals(TH.make_vps())
    units += _nals(TH.make_sps())
    units += _nals(TH.make_pps())
    units += _nals(TH.make_sps(width=1920, height=1080, log2_ctb=6))
    units += _nals(TH.make_pps(deblock=True, beta_offset=2, tc_offset=-2))
    checked = 0
    for u in units:
        t = (u[0] >> 1) & 0x3F
        if t not in (32, 33, 34):
            continue
        obj = HevcCodedBitstream.read_nal(u)
        assert HevcCodedBitstream.write_nal(obj) == u
        checked += 1
    assert checked >= 5


def test_cbs_hevc_field_edit_reencodes():
    import test_hevc as TH
    (sps,) = [u for u in _nals(TH.make_sps()) if (u[0] >> 1) & 0x3F == 33]
    obj = HevcCodedBitstream.read_nal(sps)
    obj["general_level_idc"] = 153
    out = HevcCodedBitstream.write_nal(obj)
    assert out != sps
    assert HevcCodedBitstream.read_nal(out)["general_level_idc"] == 153


@requires_ref
def test_hevc_metadata_bsf_vs_ffprobe(tmp_path):
    """Edited VUI/PTL fields are visible to the reference ffprobe and
    the stream still decodes byte-exact in both decoders."""
    stream = _crafted_stream()
    f = get_bsf("hevc_metadata", sample_aspect_ratio="4:3",
                video_format=1, video_full_range_flag=1,
                colour_primaries=9, transfer_characteristics=16,
                matrix_coeffs=9, level=4.1, tick_rate="50:1",
                chroma_sample_loc_type=1)
    out = bytes(f.filter(Packet(data=stream))[0].data)
    p = tmp_path / "m.hevc"
    p.write_bytes(out)
    pr = subprocess.run(
        [str(refutil.REFPROBE), "-v", "error", "-show_streams",
         "-of", "json", str(p)], capture_output=True, check=True)
    st = json.loads(pr.stdout)["streams"][0]
    assert st["sample_aspect_ratio"] == "4:3"
    assert st["color_range"] == "pc"
    assert st["color_primaries"] == "bt2020"
    assert st["color_transfer"] == "smpte2084"
    assert st["color_space"] == "bt2020nc"
    assert st["level"] == 123
    assert st["r_frame_rate"] == "50/1"
    assert st.get("chroma_location") in ("center", "topleft", "top")
    dec = CodecContext.open_decoder(CodecParameters(
        codec_type=MediaType.VIDEO, codec_id="hevc"))
    frames = dec.decode_all([Packet(data=out, pts=0)])
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(p),
         "-f", "rawvideo", "-"], capture_output=True, check=True).stdout
    ours = b"".join(np.ascontiguousarray(pl).tobytes()
                    for fr in frames for pl in fr.planes)
    assert ours == raw


@requires_ref
def test_hevc_metadata_crop_vs_ffprobe(tmp_path):
    stream = _crafted_stream(seed=3, n_frames=1)
    f = get_bsf("hevc_metadata", crop_right=4, crop_bottom=2)
    out = bytes(f.filter(Packet(data=stream))[0].data)
    p = tmp_path / "c.hevc"
    p.write_bytes(out)
    pr = subprocess.run(
        [str(refutil.REFPROBE), "-v", "error", "-show_streams",
         "-of", "json", str(p)], capture_output=True, check=True)
    st = json.loads(pr.stdout)["streams"][0]
    import test_hevc as TH
    assert st["width"] == TH.W - 4
    assert st["height"] == TH.H - 2


@requires_ref
def test_av1_metadata_bsf_vs_ffprobe(tmp_path):
    """AV1 sequence-header color edits visible to the reference."""
    from ffmpeg_tpu.codecs import av1 as A
    s = A.Av1SequenceHeader(max_frame_width=64, max_frame_height=48,
                            frame_width_bits=7, frame_height_bits=7)
    h = A.Av1FrameHeader(frame_type=A.KEY_FRAME, show_frame=1,
                         width=64, height=48, render_width=64,
                         render_height=48)
    data = (A.wrap_obu(A.OBU_TEMPORAL_DELIMITER, b"")
            + A.wrap_obu(A.OBU_SEQUENCE_HEADER,
                         A.write_sequence_header(s))
            + A.wrap_obu(A.OBU_FRAME_HEADER, A.write_frame_header(h, s))
            + A.wrap_obu(A.OBU_TILE_GROUP, b"\x00" * 8))
    f = get_bsf("av1_metadata", color_primaries=9,
                transfer_characteristics=16, matrix_coefficients=9,
                color_range="pc")
    out = bytes(f.filter(Packet(data=data))[0].data)
    assert out != data
    # our own parser sees the edits
    obus = A.split_obus(out)
    s2 = A.parse_sequence_header(
        next(o for o in obus
             if o.type == A.OBU_SEQUENCE_HEADER).payload)
    assert (s2.color_primaries, s2.transfer_characteristics,
            s2.matrix_coefficients, s2.color_range) == (9, 16, 9, 1)
    # and the reference parser agrees (via IVF container)
    import struct
    ivf = (b"DKIF" + struct.pack("<HH4sHHIII", 0, 32, b"AV01", 64, 48,
                                 25, 1, 1) + struct.pack("<IQ", len(out),
                                                         0) + out)
    p = tmp_path / "m.ivf"
    p.write_bytes(ivf)
    pr = subprocess.run(
        [str(refutil.REFPROBE), "-v", "error", "-show_streams",
         "-of", "json", str(p)], capture_output=True, check=True)
    st = json.loads(pr.stdout)["streams"][0]
    # the reference's AV1 decode is hwaccel-only so ffprobe does not
    # surface color props here; it proves the edited syntax still
    # parses (codec recognized, geometry intact)
    assert st["codec_name"] == "av1"
    assert st["width"] == 64 and st["height"] == 48


def test_dts2pts_reordered_gop():
    """B-frame-style PTS order: dts must come out monotonic, <= pts,
    and be the sorted pts sequence (delay >= reorder depth)."""
    from ffmpeg_tpu.utils.rational import NOPTS
    f = get_bsf("dts2pts", delay=2)
    # coding order IPBB...: pts 0 3 1 2 6 4 5
    pts_seq = [0, 3, 1, 2, 6, 4, 5]
    out = []
    for p in pts_seq:
        out += f.filter(Packet(data=b"x", pts=p, dts=NOPTS))
    out += f.filter(None)
    assert [p.pts for p in out] == pts_seq
    dts = [p.dts for p in out]
    assert dts == [v - 2 for v in sorted(pts_seq)]
    assert all(d <= p for d, p in zip(dts, [p.pts for p in out]))
    assert dts == sorted(dts)
