"""VP8 inter-frame tests: crafted key+inter streams cross-checked
byte-exact against the reference decoder — MV prediction, split MVs,
6/4-tap sub-pel MC, golden/altref management and loop filtering."""

import struct

import numpy as np
import pytest

from conftest import requires_ref

from test_vp8 import Plan, craft_kf, _decode_vs_ref, W, H

from ffmpeg_tpu.codecs.vp8 import VP8Core
from ffmpeg_tpu.codecs.vp8.block import FrameState, MBWalker
from ffmpeg_tpu.codecs.vp8.header import parse_header
from ffmpeg_tpu.codecs.vp8 import tables_gen as T
from ffmpeg_tpu.codecs.vp9.bool import BoolEncoder


class InterPlan(Plan):
    def __init__(self, rng, inter_p=0.85, split_p=0.1, mv_amp=40,
                 golden_p=0.15, **kw):
        super().__init__(rng, **kw)
        self.inter_p = inter_p
        self.split_p = split_p
        self.mv_amp = mv_amp
        self.golden_p = golden_p

    def is_inter(self, mb_x, mb_y):
        return self.rng.random() < self.inter_p

    def ref(self, mb_x, mb_y):
        r = self.rng.random()
        if r < self.golden_p:
            return 2
        if r < 2 * self.golden_p:
            return 3
        return 1

    def mvmode(self, mb_x, mb_y):
        if self.rng.random() < self.split_p:
            return "split"
        return str(self.rng.choice(
            ["zero", "nearest", "near", "new", "new"]))

    def newmv(self, mb_x, mb_y):
        a = self.mv_amp
        return (int(self.rng.integers(-a, a + 1)),
                int(self.rng.integers(-a, a + 1)))

    def split_type(self, mb_x, mb_y):
        return int(self.rng.integers(0, 4))

    def submv(self, mb_x, mb_y, n):
        return str(self.rng.choice(["left", "above", "zero", "new",
                                    "new"]))

    def submv_delta(self, mb_x, mb_y, n):
        a = self.mv_amp
        return (int(self.rng.integers(-a, a + 1)),
                int(self.rng.integers(-a, a + 1)))


def craft_inter(core, plan, width=W, height=H, qi=40, filter_level=0,
                sharpness=0, simple=0, update_last=True,
                update_golden=0, update_altref=0, sign_bias=(0, 0)):
    """Craft one inter frame against the shadow core's state, then
    advance the core by decoding it."""
    c = BoolEncoder()
    c.bit(0)             # segmentation
    c.bit(simple)
    c.literal(filter_level, 6)
    c.literal(sharpness, 3)
    c.bit(0)             # lf deltas
    c.literal(0, 2)      # one token partition
    c.literal(qi, 7)
    for _ in range(5):
        c.bit(0)         # quant deltas
    # reference updates: both flags first, then the source codes
    for upd in (update_golden, update_altref):
        c.bit(1 if upd == 4 else 0)
    for upd in (update_golden, update_altref):
        if upd != 4:
            c.literal({0: 0, 1: 1}.get(upd, 2), 2)
    c.bit(sign_bias[0])
    c.bit(sign_bias[1])
    c.bit(1)             # update_probabilities
    c.bit(1 if update_last else 0)
    for i in range(4):   # token prob updates: none
        for j in range(8):
            for k in range(3):
                for tk in range(11):
                    c.put(0, int(T.TOKEN_UPDATE_PROBS[i][j][k][tk]))
    c.bit(1)             # mbskip enabled
    c.literal(200, 8)
    c.literal(40, 8)     # intra_prob (p of being inter)
    c.literal(128, 8)    # last_prob
    c.literal(128, 8)    # golden_prob
    c.bit(0)             # pred16x16 update
    c.bit(0)             # pred8x8c update
    for i in range(2):   # mv prob updates: none
        for j in range(19):
            c.put(0, int(T.MV_UPDATE_PROB[i][j]))
    part1 = c.finish()

    tag = (len(part1) << 5) | 0x10 | 1    # inter, show
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])

    mb_w, mb_h = (width + 15) >> 4, (height + 15) >> 4
    pad = bytes(16 + mb_w * mb_h // 4)
    h, probs, snap, _, _ = parse_header(
        head + part1 + pad, core.probs_saved, core.header)
    fs = FrameState(h, probs)
    hdr_enc = BoolEncoder()
    enc = BoolEncoder()
    w = MBWalker(fs, hdr_enc, [enc], encode=True, plan=plan)
    for mb_y in range(mb_h):
        fs.new_row()
        for mb_x in range(mb_w):
            w.decode_mb(mb_x, mb_y)
    part1_full = part1 + hdr_enc.finish() + pad
    tag = (len(part1_full) << 5) | 0x10 | 1
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    stream = head + part1_full + enc.finish() + pad
    core.decode_frame(stream)
    return stream


class Session:
    def __init__(self, width=W, height=H):
        self.core = VP8Core()
        self.width, self.height = width, height
        self.frames = []

    def key(self, plan, **kw):
        s = craft_kf(plan, width=self.width, height=self.height, **kw)
        self.core.decode_frame(s)
        self.frames.append(s)
        return s

    def inter(self, plan, **kw):
        s = craft_inter(self.core, plan, width=self.width,
                        height=self.height, **kw)
        self.frames.append(s)
        return s


@requires_ref
@pytest.mark.parametrize("seed", [0, 5, 9])
def test_vp8_inter_basic(tmp_path, seed):
    rng = np.random.default_rng(seed)
    s = Session()
    s.key(Plan(rng))
    for _ in range(3):
        s.inter(InterPlan(rng))
    _decode_vs_ref(s.frames, tmp_path)


@requires_ref
def test_vp8_inter_zero_clean(tmp_path):
    """All-zero-MV skip frame equals the previous frame."""
    rng = np.random.default_rng(1)
    s = Session()
    s.key(Plan(rng))
    s.inter(InterPlan(rng, inter_p=1.0, split_p=0.0, skip_p=1.0))
    _decode_vs_ref(s.frames, tmp_path)


@requires_ref
def test_vp8_inter_splitmv(tmp_path):
    rng = np.random.default_rng(11)
    s = Session()
    s.key(Plan(rng))
    for _ in range(2):
        s.inter(InterPlan(rng, split_p=0.6, mv_amp=24))
    _decode_vs_ref(s.frames, tmp_path)


@requires_ref
def test_vp8_inter_golden_altref(tmp_path):
    """Golden/altref updates, cross-copies and sign bias."""
    rng = np.random.default_rng(21)
    s = Session()
    s.key(Plan(rng))
    s.inter(InterPlan(rng), update_golden=4, sign_bias=(1, 0))
    s.inter(InterPlan(rng), update_altref=4, sign_bias=(1, 1))
    s.inter(InterPlan(rng, golden_p=0.4), update_golden=3)
    s.inter(InterPlan(rng, golden_p=0.4), update_last=False)
    _decode_vs_ref(s.frames, tmp_path)


@requires_ref
def test_vp8_inter_loopfilter(tmp_path):
    rng = np.random.default_rng(31)
    s = Session()
    s.key(Plan(rng, maxn=8, amp=60), filter_level=28)
    s.inter(InterPlan(rng, maxn=8, amp=60), filter_level=40,
            sharpness=2)
    s.inter(InterPlan(rng, maxn=8, amp=60), filter_level=24,
            simple=1)
    _decode_vs_ref(s.frames, tmp_path)
