"""CBS framework: syntax-level read/modify/write (cbs.h analog)."""

import numpy as np
import pytest

import test_h264 as H

from ffmpeg_tpu.codecs.cbs import CodedBitstream
from ffmpeg_tpu.codecs.h264 import nal as _nal
from ffmpeg_tpu.codecs.h264.params import parse_sps, parse_pps


def _units(stream):
    return list(_nal.split_annexb(stream))


def test_sps_pps_roundtrip_bit_exact():
    stream = H.make_sps() + H.make_pps()
    for unit in _units(stream):
        obj = CodedBitstream.read_nal(unit)
        assert obj is not None
        out = CodedBitstream.write_nal(obj)
        assert out == unit, obj["_type"]


def test_sps_edit_level_and_refs():
    (sps_u,) = _units(H.make_sps())
    obj = CodedBitstream.read_nal(sps_u)
    obj["level_idc"] = 41
    obj["max_num_ref_frames"] = 4
    new = CodedBitstream.write_nal(obj)
    s = parse_sps(_nal.unescape(new[1:]))
    assert s.level_idc == 41
    assert s.num_ref_frames == 4
    assert s.mb_width == parse_sps(_nal.unescape(sps_u[1:])).mb_width


def test_h264_metadata_bsf():
    from ffmpeg_tpu.codecs.bsf import get_bsf
    from ffmpeg_tpu.core.packet import Packet
    stream = H.craft_i16x16_residual(seed=2)
    f = get_bsf("h264_metadata", None, level=32)
    (out,) = f.filter(Packet(data=stream, pts=0))
    assert out.data != stream
    # stream still decodes identically (only the SPS level changed)
    from ffmpeg_tpu.codecs import CodecContext
    from ffmpeg_tpu.io.stream import CodecParameters, MediaType
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
    a = CodecContext.open_decoder(par).decode_all([Packet(data=stream,
                                                          pts=0)])
    b = CodecContext.open_decoder(par).decode_all([Packet(data=out.data,
                                                          pts=0)])
    for fa, fb in zip(a, b):
        for pa, pb in zip(fa.planes, fb.planes):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    # and the new level is visible
    for unit in _units(bytes(out.data)):
        obj = CodedBitstream.read_nal(unit)
        if obj and obj["_nal_type"] == 7:
            assert obj["level_idc"] == 32
