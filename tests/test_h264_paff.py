"""H.264 PAFF (picture-adaptive field coding) tests: crafted field
pictures — IPCM, intra with residual (field coefficient scan), and
P-fields with inter prediction from reference fields — decoded by the
reference binary and by us, woven frames compared byte-exact."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from test_h264 import BW, nal, write_residual, _nc

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs.h264 import tables as HT
from ffmpeg_tpu.codecs.h264.slice_dec import _BLK_XY
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational

MB_W, MB_H = 4, 2          # field geometry: 64x32 -> 64x64 frames


def make_sps_paff(mb_w=MB_W, mb_h=MB_H, num_ref=4):
    w = BW()
    w.u(66, 8)
    w.u(0, 8)
    w.u(30, 8)
    w.ue(0)                # sps_id
    w.ue(0)                # log2_max_frame_num - 4
    w.ue(0)                # poc_type 0
    w.ue(0)                # log2_max_poc_lsb - 4
    w.ue(num_ref)
    w.u(0, 1)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)         # FIELD MB rows
    w.u(0, 1)              # frame_mbs_only = 0
    w.u(0, 1)              # mb_adaptive = 0
    w.u(1, 1)              # direct_8x8_inference
    w.u(0, 1)              # no cropping
    w.u(0, 1)              # no vui
    return nal(3, 7, w.rbsp())


def make_pps_plain():
    w = BW()
    w.ue(0)
    w.ue(0)
    w.u(0, 1)              # cavlc
    w.u(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 2)
    w.se(0)
    w.se(0)
    w.se(0)
    w.u(1, 1)              # deblocking control present
    w.u(0, 1)
    w.u(0, 1)
    return nal(3, 8, w.rbsp())


def field_head(w, stype, bottom, idr, frame_num, poc_lsb):
    w.ue(0)                # first_mb
    w.ue(stype + 5)
    w.ue(0)                # pps
    w.u(frame_num, 4)
    w.u(1, 1)              # field_pic_flag
    w.u(bottom, 1)
    if idr:
        w.ue(0)
    w.u(poc_lsb, 4)
    if stype == 0:
        w.u(0, 1)          # no num_ref override
        w.u(0, 1)          # no list modification
    if idr:
        w.u(0, 1)
        w.u(0, 1)
    else:
        w.u(0, 1)          # sliding-window marking
    w.se(0)                # qp_delta
    w.ue(1)                # disable deblocking


def ipcm_field(bottom, idr, frame_num, poc, seed, mb_w=MB_W,
               mb_h=MB_H):
    w = BW()
    field_head(w, 2, bottom, idr, frame_num, poc)
    rng = np.random.default_rng(seed)
    for _ in range(mb_w * mb_h):
        w.ue(25)
        while len(w.bits) % 8:
            w.bits.append(0)
        for v in rng.integers(0, 256, 384):
            w.u(int(v), 8)
    return nal(3, 5 if idr else 1, w.rbsp())


def i16_field(bottom, idr, frame_num, poc, seed, mb_w=MB_W,
              mb_h=MB_H):
    """I_16x16 DC-pred field with luma-DC residual — exercises the
    field coefficient scan (Table 8-12)."""
    rng = np.random.default_rng(seed)
    w = BW()
    field_head(w, 2, bottom, idr, frame_num, poc)
    nnz = np.full((mb_h * 4, mb_w * 4), -1, np.int32)
    for idx in range(mb_w * mb_h):
        mbx, mby = idx % mb_w, idx // mb_w
        w.ue(1 + 2)        # I_16x16, DC, cbp 0
        w.ue(0)            # chroma DC mode
        w.se(0)
        lv = [0] * 16
        for p in sorted(rng.choice(16, 3, replace=False)):
            lv[p] = int(rng.integers(-6, 7)) or 1
        nc = _nc(nnz, mbx * 4, mby * 4)
        total = write_residual(w, lv, 16, nc)
        nnz[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = total
    return nal(3, 5 if idr else 1, w.rbsp())


def p_field(bottom, frame_num, poc, seed, residual=True, mb_w=MB_W,
            mb_h=MB_H):
    rng = np.random.default_rng(seed)
    w = BW()
    field_head(w, 0, bottom, False, frame_num, poc)
    nnz = np.full((mb_h * 4, mb_w * 4), -1, np.int32)
    idx = 0
    n = mb_w * mb_h
    while idx < n:
        run = int(rng.integers(0, 3)) if 0 < idx < n - 2 else 0
        w.ue(run)
        for _ in range(run):
            mbx, mby = idx % mb_w, idx // mb_w
            nnz[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
            idx += 1
        if idx >= n:
            break
        mbx, mby = idx % mb_w, idx // mb_w
        mb_type = int(rng.integers(0, 3))
        w.ue(mb_type)
        for _ in range(1 if mb_type == 0 else 2):
            w.se(int(rng.integers(-8, 9)))
            w.se(int(rng.integers(-8, 9)))
        cbp_luma = 15 if (residual and rng.integers(0, 2)) else 0
        w.ue(HT.GOLOMB_TO_INTER_CBP.index(cbp_luma))
        if cbp_luma:
            w.se(0)
            for blk in range(16):
                dx, dy = _BLK_XY[blk]
                bx, by = mbx * 4 + dx, mby * 4 + dy
                lv = [0] * 16
                nlv = int(rng.integers(0, 3))
                for p in (sorted(rng.choice(16, nlv, replace=False))
                          if nlv else []):
                    lv[p] = int(rng.integers(-4, 5)) or 1
                total = write_residual(w, lv, 16, _nc(nnz, bx, by))
                nnz[by, bx] = total
        else:
            nnz[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 0
        idx += 1
    return nal(2, 1, w.rbsp())


def _ours(data):
    par = CodecParameters(codec_type=MediaType.VIDEO,
                          codec_id="h264")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=data, pts=0,
                                    time_base=Rational(1, 25))])
    return np.concatenate(
        [np.concatenate([np.asarray(p).ravel() for p in f.planes])
         for f in frames]), frames


def _ref(data, tmp_path):
    p = tmp_path / "s.h264"
    p.write_bytes(data)
    out = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i",
         str(p), "-f", "rawvideo", "-"],
        check=True, capture_output=True).stdout
    return np.frombuffer(out, np.uint8)


@requires_ref
def test_paff_ipcm_fields(tmp_path):
    s = make_sps_paff() + make_pps_plain() \
        + ipcm_field(0, True, 0, 0, 1) \
        + ipcm_field(1, False, 0, 1, 2)
    got, frames = _ours(s)
    want = _ref(s, tmp_path)
    assert frames[0].interlaced and frames[0].top_field_first
    assert frames[0].height == MB_H * 32
    np.testing.assert_array_equal(got, want)


@requires_ref
def test_paff_i16_field_scan(tmp_path):
    s = make_sps_paff() + make_pps_plain() \
        + i16_field(0, True, 0, 0, 3) \
        + i16_field(1, False, 0, 1, 4)
    got, _ = _ours(s)
    np.testing.assert_array_equal(got, _ref(s, tmp_path))


@requires_ref
def test_paff_p_fields(tmp_path):
    s = make_sps_paff() + make_pps_plain() \
        + ipcm_field(0, True, 0, 0, 1) \
        + ipcm_field(1, False, 0, 1, 2) \
        + p_field(0, 1, 2, 3) \
        + p_field(1, 1, 3, 4)
    got, frames = _ours(s)
    assert len(frames) == 2
    np.testing.assert_array_equal(got, _ref(s, tmp_path))


@requires_ref
def test_paff_bottom_field_first(tmp_path):
    s = make_sps_paff() + make_pps_plain() \
        + ipcm_field(1, True, 0, 0, 5) \
        + ipcm_field(0, False, 0, 1, 6)
    got, frames = _ours(s)
    assert frames[0].interlaced and not frames[0].top_field_first
    np.testing.assert_array_equal(got, _ref(s, tmp_path))


@requires_ref
def test_paff_field_gop(tmp_path):
    """Three frames of fields: IDR I/I, P/P, P/P — exercises the
    field reference list across several frames."""
    s = make_sps_paff() + make_pps_plain() \
        + ipcm_field(0, True, 0, 0, 1) \
        + ipcm_field(1, False, 0, 1, 2)
    seed = 10
    for fn in (1, 2):
        s += p_field(0, fn, 2 * fn, seed)
        s += p_field(1, fn, 2 * fn + 1, seed + 1)
        seed += 2
    got, frames = _ours(s)
    assert len(frames) == 3
    np.testing.assert_array_equal(got, _ref(s, tmp_path))
