"""VP8 keyframe decoder tests: crafted streams (block.py walked in
the encode direction) cross-checked byte-exact against the reference
decoder."""

import struct
import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs.vp8 import decode_frame
from ffmpeg_tpu.codecs.vp8.block import FrameState, MBWalker
from ffmpeg_tpu.codecs.vp8.header import parse_header
from ffmpeg_tpu.codecs.vp8 import tables_gen as T
from ffmpeg_tpu.codecs.vp9.bool import BoolDecoder, BoolEncoder
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational

W, H = 80, 64


class Plan:
    def __init__(self, rng, skip_p=0.1, i4_p=0.35, maxn=5, amp=30,
                 seg=False):
        self.rng = rng
        self.skip_p = skip_p
        self.i4_p = i4_p
        self.maxn = maxn
        self.amp = amp
        self.seg = seg

    def segment(self, mb_x, mb_y):
        return int(self.rng.integers(0, 4))

    def skip(self, mb_x, mb_y):
        return self.rng.random() < self.skip_p

    def ymode(self, mb_x, mb_y):
        if self.rng.random() < self.i4_p:
            return 4                      # MODE_I4x4
        return int(self.rng.integers(0, 4))

    def b4mode(self, mb_x, mb_y, k):
        return int(self.rng.integers(0, 10))

    def uvmode(self, mb_x, mb_y):
        return int(self.rng.integers(0, 4))

    def levels(self, mb_x, mb_y, kind, idx):
        lv = np.zeros(16, np.int64)
        k = int(self.rng.integers(0, self.maxn + 1))
        for _ in range(k):
            p = int(self.rng.integers(0, 16))
            lv[p] = int(self.rng.integers(-self.amp, self.amp + 1))
        return lv


def craft_kf(plan, width=W, height=H, qi=40, filter_level=0,
             sharpness=0, simple=0, n_parts_log2=0, seg=False,
             q_deltas=(0, 0, 0, 0, 0), lf_deltas=None):
    # first partition
    c = BoolEncoder()
    c.bit(0)             # colorspace
    c.bit(0)             # fullrange
    c.bit(1 if seg else 0)
    if seg:
        c.bit(1)         # update_map
        c.bit(1)         # update_feature_data
        c.bit(0)         # absolute_vals: delta
        for i in range(4):                # quant deltas per segment
            v = (i - 1) * 8
            c.bit(1)
            c.literal(abs(v), 7)
            c.bit(1 if v < 0 else 0)
        for i in range(4):                # filter deltas
            c.bit(0)
        for i in range(3):                # segmentid probs
            c.bit(1)
            c.literal(128 + 20 * i, 8)
    c.bit(simple)
    c.literal(filter_level, 6)
    c.literal(sharpness, 3)
    if lf_deltas:
        c.bit(1)          # lf delta enabled
        c.bit(1)          # update
        for d in lf_deltas[:4]:
            if d:
                c.bit(1)
                c.literal(abs(d), 6)
                c.bit(1 if d < 0 else 0)
            else:
                c.bit(0)
        for d in lf_deltas[4:]:
            if d:
                c.bit(1)
                c.literal(abs(d), 6)
                c.bit(1 if d < 0 else 0)
            else:
                c.bit(0)
    else:
        c.bit(0)
    c.literal(n_parts_log2, 2)
    c.literal(qi, 7)
    for d in q_deltas:
        if d:
            c.bit(1)
            c.literal(abs(d), 4)
            c.bit(1 if d < 0 else 0)
        else:
            c.bit(0)
    c.bit(1)             # update_probabilities
    for i in range(4):   # token prob updates: none
        for j in range(8):
            for k in range(3):
                for tk in range(11):
                    c.put(0, int(T.TOKEN_UPDATE_PROBS[i][j][k][tk]))
    c.bit(1)             # mbskip enabled
    c.literal(200, 8)
    part1 = c.finish()

    # assemble header bytes, then re-parse to drive the encode walker
    tag = (len(part1) << 5) | 0x10
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a"
    head += struct.pack("<HH", width, height)
    n_parts = 1 << n_parts_log2
    mb_h = (height + 15) >> 4
    mb_w = (width + 15) >> 4

    encs = [BoolEncoder() for _ in range(n_parts)]
    # dummy parse to build probs/header state for the walker
    dummy_parts = [b"\x00" * 16] * n_parts
    sizes = b"".join(struct.pack("<I", 16)[:3]
                     for _ in range(n_parts - 1))
    h, probs, snap, _, _ = parse_header(
        head + part1 + sizes + b"".join(dummy_parts))
    fs = FrameState(h, probs)
    hdr_enc = BoolEncoder()
    w = MBWalker(fs, hdr_enc, encs, encode=True, plan=plan)
    for mb_y in range(mb_h):
        fs.new_row()
        for mb_x in range(mb_w):
            w.decode_mb(mb_x, mb_y)
    # generous zero padding: the reference checks vpx_rac_is_end()
    # before every MB and aborts when a partition's lookahead window
    # reaches the end, which near-empty crafted partitions would trip
    pad = bytes(16 + mb_w * mb_h // 4)
    parts = [e.finish() + pad for e in encs]
    mode_bits = hdr_enc.finish() + pad

    part1_full = part1 + mode_bits
    tag = (len(part1_full) << 5) | 0x10
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a" + struct.pack("<HH", width, height)
    sizes = b"".join(len(p).to_bytes(3, "little")
                     for p in parts[:-1])
    return head + part1_full + sizes + b"".join(parts)


def wrap_ivf(frames, width, height, fourcc=b"VP80"):
    out = bytearray(b"DKIF" + struct.pack("<HH4sHHIIQ", 0, 32, fourcc,
                                          width, height, 25, 1,
                                          len(frames)))
    for i, f in enumerate(frames):
        out += struct.pack("<IQ", len(f), i)
        out += f
    return bytes(out)


def _decode_vs_ref(streams, tmp_path, width=W, height=H):
    if isinstance(streams, bytes):
        streams = [streams]
    p = tmp_path / "s.ivf"
    p.write_bytes(wrap_ivf(streams, width, height))
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    cw, ch = (width + 1) // 2, (height + 1) // 2
    sz = width * height + 2 * cw * ch
    assert len(raw) == sz * len(streams)
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="vp8",
                          width=width, height=height)
    dec = CodecContext.open_decoder(par)
    pkts = [Packet(data=s, pts=i, time_base=Rational(1, 25))
            for i, s in enumerate(streams)]
    frames = dec.decode_all(pkts)
    assert len(frames) == len(streams)
    got = np.concatenate([np.asarray(pl).ravel()
                          for f in frames for pl in f.planes])
    want = np.frombuffer(raw, np.uint8)
    np.testing.assert_array_equal(got, want)


@requires_ref
@pytest.mark.parametrize("seed", [0, 3, 7])
def test_vp8_kf(tmp_path, seed):
    rng = np.random.default_rng(seed)
    _decode_vs_ref(craft_kf(Plan(rng)), tmp_path)


@requires_ref
def test_vp8_kf_pred_only(tmp_path):
    rng = np.random.default_rng(1)
    _decode_vs_ref(craft_kf(Plan(rng, skip_p=1.0)), tmp_path)


@requires_ref
def test_vp8_kf_dense(tmp_path):
    """High-magnitude tokens exercise cat3-6 extra bits."""
    rng = np.random.default_rng(17)
    _decode_vs_ref(craft_kf(Plan(rng, maxn=14, amp=600), qi=100),
                   tmp_path)


@requires_ref
def test_vp8_kf_qdeltas(tmp_path):
    rng = np.random.default_rng(23)
    _decode_vs_ref(craft_kf(Plan(rng), qi=90,
                            q_deltas=(4, -3, 7, -2, 5)), tmp_path)


@requires_ref
@pytest.mark.parametrize("lvl,sharp", [(20, 0), (40, 2), (63, 7)])
def test_vp8_kf_loopfilter(tmp_path, lvl, sharp):
    rng = np.random.default_rng(29 + lvl)
    _decode_vs_ref(craft_kf(Plan(rng, maxn=8, amp=60),
                            filter_level=lvl, sharpness=sharp),
                   tmp_path)


@requires_ref
def test_vp8_kf_simple_filter(tmp_path):
    rng = np.random.default_rng(31)
    _decode_vs_ref(craft_kf(Plan(rng, maxn=8, amp=60),
                            filter_level=32, simple=1), tmp_path)


@requires_ref
def test_vp8_kf_partitions(tmp_path):
    """4 token partitions: rows round-robin across coders."""
    rng = np.random.default_rng(37)
    _decode_vs_ref(craft_kf(Plan(rng), n_parts_log2=2), tmp_path)


@requires_ref
def test_vp8_kf_segmentation(tmp_path):
    """Per-segment quantizers + segment map coding."""
    rng = np.random.default_rng(41)
    _decode_vs_ref(craft_kf(Plan(rng, seg=True), seg=True), tmp_path)


@requires_ref
def test_vp8_kf_odd_size(tmp_path):
    rng = np.random.default_rng(47)
    _decode_vs_ref(craft_kf(Plan(rng), width=70, height=50),
                   tmp_path, width=70, height=50)
