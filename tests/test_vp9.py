"""VP9 keyframe decoder tests: crafted streams (the block.py walker
run in the encode direction with a BoolEncoder) cross-checked
byte-exact against the reference decoder — the strategy proven on
H.264 and HEVC."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from test_h264 import BW

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs.vp9 import decode_frame, tile_bounds
from ffmpeg_tpu.codecs.vp9.block import FrameState, TileWalker
from ffmpeg_tpu.codecs.vp9.bool import BoolDecoder, BoolEncoder
from ffmpeg_tpu.codecs.vp9.header import (parse_compressed,
                                          parse_uncompressed)
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational

W, H = 64, 64


def test_bool_roundtrip():
    rng = np.random.default_rng(0)
    bits = [(int(rng.integers(0, 2)), int(rng.integers(1, 255)))
            for _ in range(4000)]
    enc = BoolEncoder()
    for b, p in bits:
        enc.put(b, p)
    data = enc.finish()
    dec = BoolDecoder(data)
    for b, p in bits:
        assert dec.get(p) == b


class Plan:
    """Block intents for the encode-direction walker."""

    def __init__(self, rng, split_p=0.4, skip_p=0.15, maxn=6, amp=40,
                 tx_bias=None):
        self.rng = rng
        self.split_p = split_p
        self.skip_p = skip_p
        self.maxn = maxn
        self.amp = amp
        self.tx_bias = tx_bias

    def partition(self, row, col, bl, allowed):
        if self.rng.random() < self.split_p and 3 in allowed:
            return 3
        return int(self.rng.choice([a for a in allowed if a != 3] or
                                   [3]))

    def skip(self, row, col, bs):
        return self.rng.random() < self.skip_p

    def tx(self, row, col, max_tx):
        if self.tx_bias is not None:
            return min(self.tx_bias, max_tx)
        return int(self.rng.integers(0, max_tx + 1))

    def ymode(self, row, col, i, a, l):
        return int(self.rng.integers(0, 10))

    def uvmode(self, row, col, ymode):
        return int(self.rng.integers(0, 10))

    def levels(self, row, col, plane, n, idx):
        lv = np.zeros((n, n), np.int64)
        k = int(self.rng.integers(0, self.maxn + 1))
        for _ in range(k):
            yy = int(self.rng.integers(0, n))
            xx = int(self.rng.integers(0, n))
            lv[yy, xx] = int(self.rng.integers(-self.amp,
                                               self.amp + 1))
        return lv


def write_uncompressed(w, width, height, qi, filter_level, sharpness,
                       lf_delta, tile_cols_log2, tile_rows_log2,
                       compressed_size):
    w.u(2, 2)            # frame marker
    w.u(0, 1)            # profile low
    w.u(0, 1)            # profile high
    w.u(0, 1)            # show_existing_frame
    w.u(0, 1)            # frame_type: key
    w.u(1, 1)            # show_frame
    w.u(0, 1)            # error_resilient
    w.u(0x498342, 24)    # sync code
    w.u(0, 3)            # color_space: unknown
    w.u(0, 1)            # color_range
    w.u(width - 1, 16)
    w.u(height - 1, 16)
    w.u(0, 1)            # render_and_frame_size_different
    w.u(0, 1)            # refresh_frame_context
    w.u(0, 1)            # frame_parallel_decoding_mode
    w.u(0, 2)            # frame_context_idx
    w.u(filter_level, 6)
    w.u(sharpness, 3)
    w.u(1 if lf_delta else 0, 1)
    if lf_delta:
        w.u(0, 1)        # no delta update (defaults apply)
    w.u(qi, 8)
    w.u(0, 1)            # ydc delta
    w.u(0, 1)            # uvdc delta
    w.u(0, 1)            # uvac delta
    w.u(0, 1)            # segmentation
    # tiling
    sb_cols = (width + 63) >> 6
    min_log2 = 0
    while sb_cols > (64 << min_log2):
        min_log2 += 1
    max_log2 = 0
    while (sb_cols >> max_log2) >= 4:
        max_log2 += 1
    max_log2 = max(0, max_log2 - 1)
    assert min_log2 <= tile_cols_log2 <= max_log2 or \
        tile_cols_log2 == min_log2
    t = tile_cols_log2 - min_log2
    while t > 0:
        w.u(1, 1)
        t -= 1
    if tile_cols_log2 < max_log2:
        w.u(0, 1)
    # decode012 for rows
    if tile_rows_log2 == 0:
        w.u(0, 1)
    else:
        w.u(1, 1)
        w.u(tile_rows_log2 - 1, 1)
    w.u(compressed_size, 16)
    while len(w.bits) % 8:
        w.u(0, 1)
    return w


def write_compressed(txmode):
    c = BoolEncoder()
    c.bit(0)             # marker
    c.literal(min(txmode, 3), 2)
    if txmode >= 3:
        c.bit(1 if txmode == 4 else 0)
    if txmode == 4:
        for _ in range(2 + 4 + 6):        # tx8p/tx16p/tx32p updates
            c.put(0, 252)
    for _ in range(min(txmode, 3) + 1):   # per-tx coef update flags
        c.bit(0)
    for _ in range(3):                    # skip prob updates
        c.put(0, 252)
    return c.finish()


def craft_frame(plan, width=W, height=H, qi=60, filter_level=0,
                sharpness=0, lf_delta=False, txmode=4,
                tile_cols_log2=0, tile_rows_log2=0):
    from test_h264_cabac import _bits_to_bytes
    comp = write_compressed(txmode)
    hw = write_uncompressed(BW(), width, height, qi, filter_level,
                            sharpness, lf_delta, tile_cols_log2,
                            tile_rows_log2, len(comp))
    head = bytes(_bits_to_bytes(hw.bits)) + comp
    # parse back to get the exact decoder-side state
    h = parse_uncompressed(head)
    probs = parse_compressed(h, comp)
    fs = FrameState(h, probs)
    n_tc = 1 << tile_cols_log2
    n_tr = 1 << tile_rows_log2
    tiles = []
    for tr in range(n_tr):
        r0, r1 = tile_bounds(tr, tile_rows_log2, fs.sb_rows)
        encs = []
        walkers = []
        for tc in range(n_tc):
            c0, c1 = tile_bounds(tc, tile_cols_log2, fs.sb_cols)
            enc = BoolEncoder()
            enc.bit(0)   # marker
            encs.append(enc)
            walkers.append(TileWalker(fs, enc, encode=True, plan=plan,
                                      tile_col_start=c0,
                                      tile_col_end=c1))
        for row in range(r0, min(r1, fs.rows), 8):
            for wk in walkers:
                fs.new_tile_left()
                for col in range(wk.tile_col_start,
                                 min(wk.tile_col_end, fs.cols), 8):
                    wk.decode_sb(row, col, 0)
        tiles.extend(e.finish() for e in encs)
    out = bytearray(head)
    for i, t in enumerate(tiles):
        if i != len(tiles) - 1:
            out += len(t).to_bytes(4, "big")
        out += t
    if out[-1] & 0xE0 == 0xC0:            # avoid superframe marker
        out += b"\x00"
    return bytes(out)


def wrap_ivf(frames, width, height):
    import struct
    out = bytearray(b"DKIF" + struct.pack("<HH4sHHIIQ", 0, 32, b"VP90",
                                          width, height, 25, 1,
                                          len(frames)))
    for i, f in enumerate(frames):
        out += struct.pack("<IQ", len(f), i)
        out += f
    return bytes(out)


def _decode_vs_ref(stream, tmp_path, width=W, height=H, n_frames=1):
    p = tmp_path / "s.ivf"
    p.write_bytes(wrap_ivf([stream] if isinstance(stream, bytes)
                           else stream, width, height))
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(p),
         "-fps_mode", "passthrough", "-f", "rawvideo", "-"],
        check=True, capture_output=True).stdout
    cw, ch = (width + 1) // 2, (height + 1) // 2
    sz = width * height + 2 * cw * ch
    assert len(raw) == sz * n_frames, \
        f"reference produced {len(raw)}, want {sz * n_frames}"
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="vp9",
                          width=width, height=height)
    dec = CodecContext.open_decoder(par)
    pkts = [Packet(data=s, pts=i, time_base=Rational(1, 25))
            for i, s in enumerate([stream] if isinstance(stream, bytes)
                                  else stream)]
    frames = dec.decode_all(pkts)
    assert len(frames) == n_frames
    got = np.concatenate([np.asarray(pl).ravel()
                          for f in frames for pl in f.planes])
    want = np.frombuffer(raw, np.uint8)
    np.testing.assert_array_equal(got, want)


@requires_ref
@pytest.mark.parametrize("seed", [0, 3, 7])
def test_vp9_kf(tmp_path, seed):
    rng = np.random.default_rng(seed)
    _decode_vs_ref(craft_frame(Plan(rng)), tmp_path)


@requires_ref
def test_vp9_kf_pred_only(tmp_path):
    """All-skip frame: pure intra prediction."""
    rng = np.random.default_rng(1)
    _decode_vs_ref(craft_frame(Plan(rng, skip_p=1.0)), tmp_path)


@requires_ref
@pytest.mark.parametrize("txb", [0, 1, 2, 3])
def test_vp9_kf_tx_sizes(tmp_path, txb):
    rng = np.random.default_rng(11 + txb)
    _decode_vs_ref(craft_frame(Plan(rng, split_p=0.2, tx_bias=txb)),
                   tmp_path)


@requires_ref
def test_vp9_kf_dense(tmp_path):
    """Dense residuals: high tokens, cat3-6 extra bits."""
    rng = np.random.default_rng(17)
    _decode_vs_ref(craft_frame(Plan(rng, maxn=30, amp=400)), tmp_path)


@requires_ref
def test_vp9_kf_128(tmp_path):
    rng = np.random.default_rng(19)
    _decode_vs_ref(craft_frame(Plan(rng), width=128, height=128),
                   tmp_path, width=128, height=128)


@requires_ref
def test_vp9_kf_partial_sb(tmp_path):
    """Frame size not an SB multiple: forced partitions + clamps."""
    rng = np.random.default_rng(23)
    _decode_vs_ref(craft_frame(Plan(rng), width=72, height=56),
                   tmp_path, width=72, height=56)


@requires_ref
@pytest.mark.parametrize("lvl,sharp,delta", [(16, 0, False),
                                             (32, 0, True),
                                             (48, 3, False)])
def test_vp9_kf_loopfilter(tmp_path, lvl, sharp, delta):
    rng = np.random.default_rng(29 + lvl)
    _decode_vs_ref(craft_frame(Plan(rng, maxn=12, amp=80),
                               filter_level=lvl, sharpness=sharp,
                               lf_delta=delta), tmp_path)


@requires_ref
def test_vp9_kf_qi(tmp_path):
    rng = np.random.default_rng(31)
    _decode_vs_ref(craft_frame(Plan(rng), qi=200), tmp_path)


@requires_ref
def test_vp9_kf_tiles(tmp_path):
    """4 tile columns on a 256-wide frame (tile-parallel entropy)."""
    rng = np.random.default_rng(37)
    _decode_vs_ref(craft_frame(Plan(rng, split_p=0.25, maxn=4),
                               width=1024, height=64,
                               tile_cols_log2=2),
                   tmp_path, width=1024, height=64)


@requires_ref
def test_vp9_kf_tile_rows(tmp_path):
    rng = np.random.default_rng(41)
    _decode_vs_ref(craft_frame(Plan(rng, split_p=0.25, maxn=4),
                               width=128, height=128,
                               tile_rows_log2=1),
                   tmp_path, width=128, height=128)


@requires_ref
def test_vp9_tiles_out_of_order(tmp_path):
    """Tile columns are entropy-independent: decoding the 4 tiles of
    each superblock row in scrambled order (the across-chips sharding
    pattern: each tile owns a disjoint column range, bitstream and
    context slice) reproduces the sequential decode bit-for-bit."""
    rng = np.random.default_rng(61)
    stream = craft_frame(Plan(rng, split_p=0.25, maxn=4),
                         width=1024, height=64, tile_cols_log2=2)
    h, fs_seq = decode_frame(stream)

    pos = (h.uncompressed_bits + 7) // 8
    fs = FrameState(h, parse_compressed(
        parse_uncompressed(stream),
        stream[pos:pos + h.compressed_size]))
    pos += h.compressed_size
    tiles = []
    for tc in range(4):
        if tc != 3:
            size = int.from_bytes(stream[pos:pos + 4], "big")
            pos += 4
        else:
            size = len(stream) - pos
        tiles.append(stream[pos:pos + size])
        pos += size
    cores = []
    for t in tiles:
        c = BoolDecoder(t)
        assert not c.get(128)
        cores.append(c)
    for row in range(0, fs.rows, 8):
        for tc in (3, 1, 0, 2):           # scrambled tile order
            c0, c1 = tile_bounds(tc, 2, fs.sb_cols)
            wk = TileWalker(fs, cores[tc], tile_col_start=c0,
                            tile_col_end=c1)
            fs.new_tile_left()
            for col in range(c0, min(c1, fs.cols), 8):
                wk.decode_sb(row, col, 0)
    from ffmpeg_tpu.codecs.vp9.lf import loopfilter_frame
    loopfilter_frame(fs)
    np.testing.assert_array_equal(fs.y, fs_seq.y)
    np.testing.assert_array_equal(fs.u, fs_seq.u)
    np.testing.assert_array_equal(fs.v, fs_seq.v)
