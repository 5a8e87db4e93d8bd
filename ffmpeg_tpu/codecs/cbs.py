"""Coded bitstream syntax framework (reference: libavcodec/cbs.h:396 +
cbs_h264_syntax_template.c).

Declarative read/MODIFY/write of parameter-set syntax: each unit type
is described once as a field table (name, descriptor, optional
condition), and the same table drives both the reader and the writer,
so read->write round-trips are bit-exact and edited fields re-encode
correctly. This powers the metadata bitstream filters and future
encoders' header generation.

Descriptors: ("u", n) fixed n bits; "ue"/"se" Exp-Golomb; ("u", name)
width taken from a previously-parsed field; "bytes" consumes the rest.
Conditions are callables over the partially-parsed dict.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple, Union

from ..utils.error import InvalidData

Field = Tuple  # (name, descriptor[, condition])


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.n = len(data) * 8

    def u(self, nbits: int) -> int:
        if self.pos + nbits > self.n:
            raise InvalidData("cbs: out of bits")
        v = 0
        for _ in range(nbits):
            v = (v << 1) | ((self.d[self.pos >> 3] >> (7 - (self.pos & 7)))
                            & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise InvalidData("cbs: bad exp-golomb")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k & 1 else -(k // 2)


class _BitWriter:
    def __init__(self):
        self.bits: List[int] = []

    def u(self, v: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int):
        k = v + 1
        nb = k.bit_length()
        self.u(0, nb - 1)
        self.u(k, nb)

    def se(self, v: int):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp(self) -> bytes:
        bits = self.bits + [1]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


class SyntaxTable:
    """One unit type: an ordered field table shared by reader/writer."""

    def __init__(self, name: str, fields: List[Field]):
        self.name = name
        self.fields = fields

    def read(self, rbsp: bytes) -> Dict:
        br = _BitReader(rbsp)
        out: Dict = {"_type": self.name}
        self._read_fields(br, self.fields, out)
        # everything after the table must be exactly the RBSP stop bit:
        # otherwise the unit carries syntax we would silently drop
        last_one = -1
        for i in range(len(rbsp) * 8):
            if (rbsp[i >> 3] >> (7 - (i & 7))) & 1:
                last_one = i
        if last_one != br.pos:
            raise InvalidData(
                f"cbs: trailing syntax in {self.name} not covered by "
                "the template")
        return out

    def _read_fields(self, br, fields, out):
        for f in fields:
            name, desc = f[0], f[1]
            cond = f[2] if len(f) > 2 else None
            if cond is not None and not cond(out):
                continue
            if isinstance(desc, tuple) and desc[0] == "u":
                width = desc[1] if isinstance(desc[1], int) \
                    else out[desc[1]]
                out[name] = br.u(width)
            elif desc == "ue":
                out[name] = br.ue()
            elif desc == "se":
                out[name] = br.se()
            elif isinstance(desc, tuple) and desc[0] == "repeat":
                count_of, sub = desc[1], desc[2]
                n = count_of(out) if callable(count_of) else out[count_of]
                lst = []
                for _ in range(n):
                    item: Dict = {}
                    item.update(out)        # expose outer fields to conds
                    self._read_fields(br, sub, item)
                    lst.append({k: v for k, v in item.items()
                                if k in [g[0] for g in sub]})
                out[name] = lst
            else:
                raise ValueError(desc)

    def write(self, obj: Dict) -> bytes:
        bw = _BitWriter()
        self._write_fields(bw, self.fields, obj)
        return bw.rbsp()

    def _write_fields(self, bw, fields, obj):
        for f in fields:
            name, desc = f[0], f[1]
            cond = f[2] if len(f) > 2 else None
            if cond is not None and not cond(obj):
                continue
            if isinstance(desc, tuple) and desc[0] == "u":
                width = desc[1] if isinstance(desc[1], int) \
                    else obj[desc[1]]
                bw.u(obj[name], width)
            elif desc == "ue":
                bw.ue(obj[name])
            elif desc == "se":
                bw.se(obj[name])
            elif isinstance(desc, tuple) and desc[0] == "repeat":
                for item in obj[name]:
                    merged = dict(obj)
                    merged.update(item)
                    self._write_fields(bw, desc[2], merged)
            else:
                raise ValueError(desc)


# --------------------------------------------------------------------------
# H.264 parameter sets (cbs_h264_syntax_template.c sps/pps subset:
# everything our decoder supports, conditions mirroring 7.3.2.1/7.3.2.2)

_PROFILES_EXT = (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139,
                 134, 135)

H264_SPS = SyntaxTable("sps", [
    ("profile_idc", ("u", 8)),
    ("constraint_flags", ("u", 8)),
    ("level_idc", ("u", 8)),
    ("sps_id", "ue"),
    ("chroma_format_idc", "ue",
     lambda o: o["profile_idc"] in _PROFILES_EXT),
    ("separate_colour_plane_flag", ("u", 1),
     lambda o: o.get("chroma_format_idc") == 3),
    ("bit_depth_luma_minus8", "ue",
     lambda o: o["profile_idc"] in _PROFILES_EXT),
    ("bit_depth_chroma_minus8", "ue",
     lambda o: o["profile_idc"] in _PROFILES_EXT),
    ("qpprime_y_zero_transform_bypass_flag", ("u", 1),
     lambda o: o["profile_idc"] in _PROFILES_EXT),
    ("seq_scaling_matrix_present_flag", ("u", 1),
     lambda o: o["profile_idc"] in _PROFILES_EXT),
    ("log2_max_frame_num_minus4", "ue"),
    ("pic_order_cnt_type", "ue"),
    ("log2_max_pic_order_cnt_lsb_minus4", "ue",
     lambda o: o["pic_order_cnt_type"] == 0),
    ("delta_pic_order_always_zero_flag", ("u", 1),
     lambda o: o["pic_order_cnt_type"] == 1),
    ("offset_for_non_ref_pic", "se",
     lambda o: o["pic_order_cnt_type"] == 1),
    ("offset_for_top_to_bottom_field", "se",
     lambda o: o["pic_order_cnt_type"] == 1),
    ("num_ref_frames_in_pic_order_cnt_cycle", "ue",
     lambda o: o["pic_order_cnt_type"] == 1),
    ("offsets_for_ref_frame",
     ("repeat", lambda o: o.get("num_ref_frames_in_pic_order_cnt_cycle",
                                0),
      [("offset_for_ref_frame", "se")]),
     lambda o: o["pic_order_cnt_type"] == 1),
    ("max_num_ref_frames", "ue"),
    ("gaps_in_frame_num_value_allowed_flag", ("u", 1)),
    ("pic_width_in_mbs_minus1", "ue"),
    ("pic_height_in_map_units_minus1", "ue"),
    ("frame_mbs_only_flag", ("u", 1)),
    ("mb_adaptive_frame_field_flag", ("u", 1),
     lambda o: not o["frame_mbs_only_flag"]),
    ("direct_8x8_inference_flag", ("u", 1)),
    ("frame_cropping_flag", ("u", 1)),
    ("frame_crop_left_offset", "ue",
     lambda o: o["frame_cropping_flag"]),
    ("frame_crop_right_offset", "ue",
     lambda o: o["frame_cropping_flag"]),
    ("frame_crop_top_offset", "ue",
     lambda o: o["frame_cropping_flag"]),
    ("frame_crop_bottom_offset", "ue",
     lambda o: o["frame_cropping_flag"]),
    ("vui_parameters_present_flag", ("u", 1)),
    # VUI is carried opaque for now (bit-exact passthrough needs the
    # full template; reject edits when present)
])

H264_PPS = SyntaxTable("pps", [
    ("pps_id", "ue"),
    ("sps_id", "ue"),
    ("entropy_coding_mode_flag", ("u", 1)),
    ("bottom_field_pic_order_in_frame_present_flag", ("u", 1)),
    ("num_slice_groups_minus1", "ue"),
    ("num_ref_idx_l0_default_active_minus1", "ue"),
    ("num_ref_idx_l1_default_active_minus1", "ue"),
    ("weighted_pred_flag", ("u", 1)),
    ("weighted_bipred_idc", ("u", 2)),
    ("pic_init_qp_minus26", "se"),
    ("pic_init_qs_minus26", "se"),
    ("chroma_qp_index_offset", "se"),
    ("deblocking_filter_control_present_flag", ("u", 1)),
    ("constrained_intra_pred_flag", ("u", 1)),
    ("redundant_pic_cnt_present_flag", ("u", 1)),
])


def _strip_rbsp_trailing(obj_bits_consumed_ok=True):
    pass


class CodedBitstream:
    """Read/modify/write for parameter-set NAL units (ff_cbs_* API)."""

    TABLES = {7: H264_SPS, 8: H264_PPS}

    @staticmethod
    def read_nal(unit: bytes) -> Optional[Dict]:
        """Annex-B-less NAL (header byte + EBSP). Returns the syntax
        dict (with _nal_ref_idc/_nal_type) or None if unsupported."""
        from .h264 import nal as _nal
        ref_idc, ntype = _nal.parse_nal_header(unit)
        table = CodedBitstream.TABLES.get(ntype)
        if table is None:
            return None
        rbsp = _nal.unescape(unit[1:])
        obj = table.read(rbsp)
        if obj.get("vui_parameters_present_flag"):
            raise InvalidData("cbs: VUI passthrough not supported")
        if obj.get("seq_scaling_matrix_present_flag"):
            raise InvalidData("cbs: scaling matrices not supported")
        obj["_nal_ref_idc"] = ref_idc
        obj["_nal_type"] = ntype
        return obj

    @staticmethod
    def write_nal(obj: Dict) -> bytes:
        table = CodedBitstream.TABLES[obj["_nal_type"]]
        rbsp = table.write(obj)
        # PPS keeps any trailing extension bits it had? we only support
        # base syntax; emulation-prevention escape:
        out = bytearray([(obj["_nal_ref_idc"] << 5) | obj["_nal_type"]])
        zeros = 0
        for b in rbsp:
            if zeros >= 2 and b <= 3:
                out.append(3)
                zeros = 0
            out.append(b)
            zeros = zeros + 1 if b == 0 else 0
        return bytes(out)
