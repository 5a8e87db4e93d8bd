"""VP9 inter-frame decoder tests: crafted key+inter streams (the
walker in encode direction) cross-checked byte-exact against the
reference decoder — single and compound prediction, all sub-pel
filters, MV prediction chains, frame-context adaptation, superframes
and show_existing_frame."""

import numpy as np
import pytest

from conftest import requires_ref

from test_h264 import BW
from test_h264_cabac import _bits_to_bytes
from test_vp9 import (Plan, craft_frame, _decode_vs_ref,
                      write_compressed)

from ffmpeg_tpu.codecs.vp9 import VP9Core, tile_bounds
from ffmpeg_tpu.codecs.vp9.block import FrameState, TileWalker
from ffmpeg_tpu.codecs.vp9.bool import BoolEncoder
from ffmpeg_tpu.codecs.vp9.header import (parse_compressed,
                                          parse_uncompressed)

W, H = 64, 64


class InterPlan(Plan):
    """Adds inter-block intents to the keyframe Plan."""

    def __init__(self, rng, inter_p=0.8, comp_p=0.0, newmv_p=0.5,
                 mv_amp=48, **kw):
        super().__init__(rng, **kw)
        self.inter_p = inter_p
        self.comp_p = comp_p
        self.newmv_p = newmv_p
        self.mv_amp = mv_amp

    def is_inter(self, row, col, bs):
        return self.rng.random() < self.inter_p

    def comp(self, row, col):
        return self.rng.random() < self.comp_p

    def ref1(self, row, col):
        return int(self.rng.integers(0, 3))

    def ref2(self, row, col):
        # desired second (variable) reference slot-index
        return int(self.rng.integers(0, 3))

    def inter_mode(self, row, col, i):
        if self.rng.random() < self.newmv_p:
            return 13                     # NEWMV
        return int(self.rng.choice([10, 11, 12]))

    def filter(self, row, col):
        return int(self.rng.integers(0, 3))

    def newmv(self, row, col, i):
        a = self.mv_amp
        r = self.rng
        return ((int(r.integers(-a, a + 1)), int(r.integers(-a, a + 1))),
                (int(r.integers(-a, a + 1)), int(r.integers(-a, a + 1))))


def write_uncompressed_inter(w, width, height, qi, filter_level,
                             sharpness, refidx, signbias, refresh,
                             refreshctx, parallelmode, framectxid,
                             hp, filtermode, errorres,
                             compressed_size, show_frame=True):
    w.u(2, 2)            # frame marker
    w.u(0, 1)            # profile low
    w.u(0, 1)            # profile high
    w.u(0, 1)            # show_existing_frame
    w.u(1, 1)            # frame_type: non-key
    w.u(1 if show_frame else 0, 1)
    w.u(1 if errorres else 0, 1)
    if not show_frame:
        w.u(0, 1)        # intraonly = 0
    if not errorres:
        w.u(0, 2)        # reset_frame_context
    w.u(refresh, 8)
    for i in range(3):
        w.u(refidx[i], 3)
        w.u(signbias[i], 1)
    w.u(0, 1)            # size from refidx[0]? no
    w.u(0, 1)
    w.u(0, 1)
    w.u(width - 1, 16)
    w.u(height - 1, 16)
    w.u(0, 1)            # render size
    w.u(1 if hp else 0, 1)
    if filtermode == 4:
        w.u(1, 1)
    else:
        w.u(0, 1)
        w.u(filtermode, 2)
    if not errorres:
        w.u(1 if refreshctx else 0, 1)
        w.u(1 if parallelmode else 0, 1)
    w.u(framectxid, 2)
    w.u(filter_level, 6)
    w.u(sharpness, 3)
    w.u(0, 1)            # lf delta disabled
    w.u(qi, 8)
    w.u(0, 1)            # ydc delta
    w.u(0, 1)            # uvdc delta
    w.u(0, 1)            # uvac delta
    w.u(0, 1)            # segmentation
    # tiling (64-wide frames: min/max log2 both 0 unless wide)
    sb_cols = (width + 63) >> 6
    min_log2 = 0
    while sb_cols > (64 << min_log2):
        min_log2 += 1
    max_log2 = 0
    while (sb_cols >> max_log2) >= 4:
        max_log2 += 1
    max_log2 = max(0, max_log2 - 1)
    if max_log2 > min_log2:
        w.u(0, 1)
    w.u(0, 1)            # tile rows log2 = 0
    w.u(compressed_size, 16)
    while len(w.bits) % 8:
        w.u(0, 1)
    return w


def write_compressed_inter(txmode, allowcomp, comppredmode, hp,
                           filter_switchable):
    c = BoolEncoder()
    c.bit(0)             # marker
    c.literal(min(txmode, 3), 2)
    if txmode >= 3:
        c.bit(1 if txmode == 4 else 0)
    if txmode == 4:
        for _ in range(2 + 4 + 6):        # tx prob updates
            c.put(0, 252)
    for _ in range(min(txmode, 3) + 1):   # per-tx coef update flags
        c.bit(0)
    for _ in range(3):                    # skip
        c.put(0, 252)
    for _ in range(21):                   # mv_mode
        c.put(0, 252)
    if filter_switchable:
        for _ in range(8):                # filter
            c.put(0, 252)
    for _ in range(4):                    # intra
        c.put(0, 252)
    if allowcomp:
        c.bit(1 if comppredmode else 0)
        if comppredmode:
            c.bit(1 if comppredmode == 2 else 0)
        if comppredmode == 2:
            for _ in range(5):            # comp
                c.put(0, 252)
    if comppredmode != 1:
        for _ in range(10):               # single_ref
            c.put(0, 252)
    if comppredmode != 0:
        for _ in range(5):                # comp_ref
            c.put(0, 252)
    for _ in range(36):                   # y_mode
        c.put(0, 252)
    for _ in range(48):                   # partition
        c.put(0, 252)
    for _ in range(3 + 2 * 22 + 2 * 9):   # mv joint + comps
        c.put(0, 252)
    if hp:
        for _ in range(4):
            c.put(0, 252)
    return c.finish()


class CraftSession:
    """Crafts a stream frame by frame, keeping a shadow decoder in
    sync so inter frames see the same contexts/refs/MV grids the real
    decoder will."""

    def __init__(self, width=W, height=H):
        self.core = VP9Core()
        self.width = width
        self.height = height
        self.frames = []

    def key(self, plan, **kw):
        s = craft_frame(plan, width=self.width, height=self.height,
                        **kw)
        self.core.decode_frame(s)
        self.frames.append(s)
        return s

    def inter(self, plan, qi=60, filter_level=0, sharpness=0,
              refidx=(0, 1, 2), signbias=(0, 0, 0), refresh=0xFF,
              refreshctx=True, parallelmode=False, framectxid=0,
              hp=False, filtermode=4, errorres=False,
              comppredmode=0, txmode=4, show_frame=True):
        core = self.core
        allowcomp = (signbias[0] != signbias[1] or
                     signbias[0] != signbias[2])
        if errorres:
            refreshctx, parallelmode = False, True
        comp = write_compressed_inter(txmode, allowcomp, comppredmode,
                                      hp, filtermode == 4)
        hw = write_uncompressed_inter(
            BW(), self.width, self.height, qi, filter_level,
            sharpness, list(refidx), list(signbias), refresh,
            refreshctx, parallelmode, framectxid, hp, filtermode,
            errorres, len(comp), show_frame)
        head = bytes(_bits_to_bytes(hw.bits)) + comp
        ref_dims = [(r[3], r[4]) if r else None for r in core.refs]
        h = parse_uncompressed(head, core.last_invisible,
                               core.lf_deltas, ref_dims)
        probs = parse_compressed(
            h, comp, core.ctx[h.framectxid])
        h.use_last_frame_mvs &= (
            core.prev is not None and core.prev[0] == h.width and
            core.prev[1] == h.height)
        prev_mv = (core.prev[2], core.prev[3]) \
            if h.use_last_frame_mvs else None
        fs = FrameState(h, probs, prev_mv=prev_mv)
        enc = BoolEncoder()
        enc.bit(0)
        wk = TileWalker(fs, enc, encode=True, plan=plan,
                        tile_col_start=0, tile_col_end=fs.cols)
        for row in range(0, fs.rows, 8):
            fs.new_tile_left()
            for col in range(0, fs.cols, 8):
                wk.decode_sb(row, col, 0)
        out = bytearray(head) + enc.finish()
        if out[-1] & 0xE0 == 0xC0:        # avoid superframe marker
            out += b"\x00"
        stream = bytes(out)
        core.decode_frame(stream)
        self.frames.append(stream)
        return stream


def _run(tmp_path, sess, n_visible=None):
    n = n_visible if n_visible is not None else len(sess.frames)
    _decode_vs_ref(sess.frames, tmp_path, width=sess.width,
                   height=sess.height, n_frames=n)


@requires_ref
@pytest.mark.parametrize("seed", [0, 5, 9])
def test_vp9_inter_basic(tmp_path, seed):
    """Key + 3 P-frames, single ref, switchable filters, NEWMV."""
    rng = np.random.default_rng(seed)
    s = CraftSession()
    s.key(Plan(rng))
    for _ in range(3):
        s.inter(InterPlan(rng), errorres=True)
    _run(tmp_path, s)


@requires_ref
def test_vp9_inter_zeromv_clean(tmp_path):
    """All-skip ZEROMV frame == previous frame exactly."""
    rng = np.random.default_rng(1)
    s = CraftSession()
    s.key(Plan(rng))
    s.inter(InterPlan(rng, inter_p=1.0, newmv_p=0.0, skip_p=1.0),
            errorres=True)
    _run(tmp_path, s)


@requires_ref
@pytest.mark.parametrize("fm", [0, 1, 2, 3])
def test_vp9_inter_fixed_filters(tmp_path, fm):
    """Fixed filtermode incl. bilinear."""
    rng = np.random.default_rng(20 + fm)
    s = CraftSession()
    s.key(Plan(rng))
    s.inter(InterPlan(rng), filtermode=fm, errorres=True)
    _run(tmp_path, s)


@requires_ref
def test_vp9_inter_hp_mvs(tmp_path):
    rng = np.random.default_rng(31)
    s = CraftSession()
    s.key(Plan(rng))
    s.inter(InterPlan(rng, mv_amp=30), hp=True, errorres=True)
    _run(tmp_path, s)


@requires_ref
def test_vp9_inter_compound(tmp_path):
    """Compound prediction (signbias split) + switchable comp mode."""
    rng = np.random.default_rng(41)
    s = CraftSession()
    s.key(Plan(rng))
    for _ in range(2):
        s.inter(InterPlan(rng, comp_p=0.5), signbias=(0, 0, 1),
                comppredmode=2, errorres=True)
    _run(tmp_path, s)


@requires_ref
def test_vp9_inter_adaptation(tmp_path):
    """refreshctx without parallelmode: both decoders must apply
    identical backward adaptation or frame 3+ diverges."""
    rng = np.random.default_rng(51)
    s = CraftSession()
    s.key(Plan(rng))
    for _ in range(4):
        s.inter(InterPlan(rng), refreshctx=True, parallelmode=False)
    _run(tmp_path, s)


@requires_ref
def test_vp9_inter_adaptation_keyframe_chain(tmp_path):
    """Keyframe also adapts (coef) into ctx 0 when refreshctx=1."""
    rng = np.random.default_rng(61)
    s = CraftSession()
    s.key(Plan(rng))                      # kf with refreshctx=0
    s.inter(InterPlan(rng), refreshctx=True, parallelmode=False)
    s.inter(InterPlan(rng), refreshctx=True, parallelmode=False,
            framectxid=1)
    s.inter(InterPlan(rng), framectxid=0, refreshctx=True,
            parallelmode=False)
    _run(tmp_path, s)


@requires_ref
def test_vp9_inter_parallelmode_ctx_store(tmp_path):
    """refreshctx + parallelmode stores forward-updated probs."""
    rng = np.random.default_rng(71)
    s = CraftSession()
    s.key(Plan(rng))
    for _ in range(3):
        s.inter(InterPlan(rng), refreshctx=True, parallelmode=True)
    _run(tmp_path, s)


@requires_ref
def test_vp9_inter_refresh_slots(tmp_path):
    """Partial refresh masks: refs diverge per slot."""
    rng = np.random.default_rng(81)
    s = CraftSession()
    s.key(Plan(rng))
    s.inter(InterPlan(rng), refresh=0x02, errorres=True)
    s.inter(InterPlan(rng), refresh=0x04, refidx=(0, 1, 0),
            errorres=True)
    s.inter(InterPlan(rng), refresh=0x00, refidx=(1, 2, 0),
            errorres=True)
    _run(tmp_path, s)


@requires_ref
def test_vp9_inter_lf(tmp_path):
    """Inter frame with the loop filter on (skip_inter edges)."""
    rng = np.random.default_rng(91)
    s = CraftSession()
    s.key(Plan(rng, maxn=10, amp=80), filter_level=32)
    s.inter(InterPlan(rng, maxn=10, amp=80), filter_level=32,
            errorres=True)
    s.inter(InterPlan(rng, maxn=10, amp=80), filter_level=48,
            sharpness=2, errorres=True)
    _run(tmp_path, s)


@requires_ref
def test_vp9_inter_invisible_show_existing(tmp_path):
    """Invisible alt-ref frame, then a show_existing_frame packet."""
    rng = np.random.default_rng(101)
    s = CraftSession()
    s.key(Plan(rng))
    s.inter(InterPlan(rng), refresh=0x10, show_frame=False,
            errorres=True)
    # show_existing of slot 4 (the invisible frame)
    w = BW()
    w.u(2, 2)
    w.u(0, 1)
    w.u(0, 1)
    w.u(1, 1)            # show_existing_frame
    w.u(4, 3)
    while len(w.bits) % 8:
        w.u(0, 1)
    s.frames.append(bytes(_bits_to_bytes(w.bits)))
    _run(tmp_path, s, n_visible=2)


@requires_ref
def test_vp9_superframe(tmp_path):
    """Invisible alt-ref + show_existing packed into one superframe
    packet with an index (the typical webm alt-ref layout)."""
    rng = np.random.default_rng(121)
    s = CraftSession()
    s.key(Plan(rng))
    inv = s.inter(InterPlan(rng), refresh=0x10, show_frame=False,
                  errorres=True)
    w = BW()
    w.u(2, 2)
    w.u(0, 1)
    w.u(0, 1)
    w.u(1, 1)            # show_existing_frame
    w.u(4, 3)
    while len(w.bits) % 8:
        w.u(0, 1)
    show = bytes(_bits_to_bytes(w.bits))
    # superframe: [inv][show][index], 2-byte magnitudes
    marker = 0xC0 | (1 << 3) | (2 - 1)
    idx = bytes([marker]) + len(inv).to_bytes(2, "little") + \
        len(show).to_bytes(2, "little") + bytes([marker])
    sf = inv + show + idx
    s.frames = [s.frames[0], sf]
    _run(tmp_path, s, n_visible=2)


@requires_ref
def test_vp9_inter_last_frame_mvs(tmp_path):
    """use_last_frame_mvs: co-located prev-frame MV candidates
    (requires non-errorres frames)."""
    rng = np.random.default_rng(111)
    s = CraftSession()
    s.key(Plan(rng))
    for _ in range(3):
        s.inter(InterPlan(rng, newmv_p=0.7), refreshctx=True,
                parallelmode=False)
    _run(tmp_path, s)
