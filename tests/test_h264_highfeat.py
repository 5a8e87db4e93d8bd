"""H.264 High-profile-adjacent features: explicit weighted prediction,
implicit bipred weights, ref_pic_list_modification, MMCO. Crafted
streams, differential vs the reference decoder, plus host/TPU recon
equality (the crafted-bitstream strategy of test_h264.py)."""

import subprocess

import numpy as np
import pytest

import refutil
import test_h264 as H
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational

W16, H16 = 64, 48   # 4x3 MBs


def make_pps_weighted(weighted_pred=False, bipred_idc=0):
    w = H.BW()
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.u(1 if weighted_pred else 0, 1)
    w.u(bipred_idc, 2)
    w.se(0)
    w.se(0)
    w.se(0)
    w.u(1, 1)
    w.u(0, 1)
    w.u(0, 1)
    return H.nal(3, 8, w.rbsp())


def weighted_p_head(w, frame_num=1, disable_deblock=True, num_ref=1,
                    weights=None, reorder=None, mmco=None):
    """P slice header with pred_weight_table / modification / MMCO."""
    w.ue(0)
    w.ue(5)
    w.ue(0)
    w.u(frame_num & 0xFF, 8)
    w.u(0, 8)
    if num_ref > 1:
        w.u(1, 1)
        w.ue(num_ref - 1)
    else:
        w.u(0, 1)
    if reorder:
        w.u(1, 1)
        for idc, val in reorder:
            w.ue(idc)
            w.ue(val)
        w.ue(3)
    else:
        w.u(0, 1)
    if weights is not None:
        ld, cd, per_ref = weights
        w.ue(ld)
        w.ue(cd)
        for (wy, oy, wc, oc) in per_ref:
            w.u(1, 1)
            w.se(wy)
            w.se(oy)
            w.u(1, 1)
            w.se(wc)
            w.se(oc)
            w.se(wc)
            w.se(oc)
    if mmco:
        w.u(1, 1)
        for op, val in mmco:
            w.ue(op)
            w.ue(val)
        w.ue(0)
    else:
        w.u(0, 1)
    w.se(0)
    w.ue(1 if disable_deblock else 0)
    if not disable_deblock:
        w.se(0)
        w.se(0)


def _craft_p(frame_num, seed, num_ref=1, weights=None, reorder=None,
             mmco=None, deblock=False):
    orig = H.p_slice_head

    def head(w, fn=frame_num, disable_deblock=True, num_ref=num_ref):
        weighted_p_head(w, frame_num=frame_num,
                        disable_deblock=not deblock, num_ref=num_ref,
                        weights=weights, reorder=reorder, mmco=mmco)
    H.p_slice_head = head
    try:
        return H.craft_p_frame(frame_num=frame_num, seed=seed,
                               deblock=deblock, num_ref=num_ref)
    finally:
        H.p_slice_head = orig


def _decode_both(stream, nframes, tmp_path, extra_nals=b""):
    data = extra_nals + stream
    p = tmp_path / "s.h264"
    p.write_bytes(data)
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
    out = {}
    for name, opts in (("host", None), ("tpu", {"recon": "tpu"})):
        dec = CodecContext.open_decoder(par, options=opts)
        frames = dec.decode_all([Packet(data=data, pts=0,
                                        time_base=Rational(1, 25))])
        out[name] = [[np.asarray(pl) for pl in f.planes] for f in frames]
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "h264", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    sz = W16 * H16 * 3 // 2
    assert len(raw) == nframes * sz, (len(raw) // sz, nframes)
    assert len(out["host"]) == nframes
    for i in range(nframes):
        got = np.concatenate([p_.ravel() for p_ in out["host"][i]])
        want = np.frombuffer(raw[i * sz:(i + 1) * sz], np.uint8)
        np.testing.assert_array_equal(got, want, err_msg=f"frame {i}")
        tpu = np.concatenate([p_.ravel() for p_ in out["tpu"][i]])
        np.testing.assert_array_equal(tpu, got,
                                      err_msg=f"tpu frame {i}")


def _i_frame(seed=7):
    return H.craft_i16x16_residual(seed=seed)


def _stream_with_pps(pps_nal, *frames, seed=7):
    """I frame (the crafters emit SPS+PPS themselves), then the custom
    PPS overriding pps_id 0 for the following P/B frames."""
    return _i_frame(seed) + pps_nal + b"".join(frames)


@requires_ref
@pytest.mark.parametrize("ld,cd,wy,oy,wc,oc", [
    (2, 1, 3, 10, 1, -5),     # brighten (fade-style weights)
    (0, 0, 2, -20, 1, 8),     # denom 0 corner case
    (7, 6, 120, 30, -60, 12),  # large weights, negative chroma weight
])
def test_weighted_pred_p_explicit(tmp_path, ld, cd, wy, oy, wc, oc):
    pps = make_pps_weighted(weighted_pred=True)
    p1 = _craft_p(1, seed=31, weights=(ld, cd, [(wy, oy, wc, oc)]))
    p2 = _craft_p(2, seed=32, weights=(ld, cd, [(wy, oy, wc, oc)]),
                  deblock=True)
    stream = _stream_with_pps(pps, p1, p2)
    _decode_both(stream, 3, tmp_path)


@requires_ref
@pytest.mark.parametrize("seed", [0, 4])
def test_implicit_bipred_b(tmp_path, seed):
    """weighted_bipred_idc=2: bi-predicted B blocks use POC-derived
    implicit weights (unequal distances: poc 0 / cur 2 / poc 6
    -> w0!=w1)."""
    import test_h264 as me
    orig = me.make_sps
    me.make_sps = lambda mb_w=4, mb_h=3: orig(mb_w, mb_h, num_ref=2)
    try:
        stream = _i_frame(seed)                       # poc 0
    finally:
        me.make_sps = orig
    stream += make_pps_weighted(bipred_idc=2)
    stream += H.craft_p_frame_poc(1, 6, seed=70 + seed)   # poc 6
    stream += H.craft_b_frame(frame_num=2, poc_lsb=2, seed=80 + seed)
    _decode_both(stream, 3, tmp_path)


@requires_ref
def test_ref_list_modification_p(tmp_path):
    """Two P frames then a P that reorders list0 to prefer the OLDER
    reference (abs_diff_pic_num selects frame_num 1 over 2)."""
    import test_h264 as me
    orig = me.make_sps
    me.make_sps = lambda mb_w=4, mb_h=3: orig(mb_w, mb_h, num_ref=2)
    try:
        stream = _i_frame(3)
    finally:
        me.make_sps = orig
    stream += _craft_p(1, seed=41)
    stream += _craft_p(2, seed=42)
    # reorder: pick pic_num 1 (two steps back) as ref 0
    stream += _craft_p(3, seed=43, num_ref=2, reorder=[(0, 1)])
    _decode_both(stream, 4, tmp_path)


@requires_ref
def test_mmco_forget_short_term(tmp_path):
    """MMCO op 1 drops the older reference mid-GOP; prediction after it
    must come from the surviving picture."""
    import test_h264 as me
    orig = me.make_sps
    me.make_sps = lambda mb_w=4, mb_h=3: orig(mb_w, mb_h, num_ref=2)
    try:
        stream = _i_frame(9)
    finally:
        me.make_sps = orig
    stream += _craft_p(1, seed=51)
    # frame 2 forgets frame_num 1 (difference_of_pic_nums_minus1 = 0)
    stream += _craft_p(2, seed=52, mmco=[(1, 0)])
    stream += _craft_p(3, seed=53)
    _decode_both(stream, 4, tmp_path)


@requires_ref
def test_error_concealment_truncated_slice(tmp_path):
    """Truncating a P slice must not abort decode: the damaged tail is
    concealed by MV-guess MC from the reference picture
    (error_resilience.c ff_er_frame_end analog)."""
    stream_i = _i_frame(5)
    p_full = _craft_p(1, seed=61)
    # chop the last 40% of the P slice NAL payload
    cut = len(p_full) - int(len(p_full) * 0.4)
    stream = stream_i + p_full[:cut]
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    assert len(frames) == 2
    iy = np.asarray(frames[0].planes[0]).astype(np.float64)
    py = np.asarray(frames[1].planes[0]).astype(np.float64)
    # concealed P frame must still track the I frame (small motion)
    mse = ((iy - py) ** 2).mean()
    psnr = 10 * np.log10(255 * 255 / max(mse, 1e-9))
    assert psnr > 20, psnr
    # strict mode must surface the error instead
    dec2 = CodecContext.open_decoder(par, options={"err_detect":
                                                   "explode"})
    with pytest.raises(Exception):
        dec2.decode_all([Packet(data=stream, pts=0,
                                time_base=Rational(1, 25))])


@requires_ref
def test_error_concealment_intra_spatial(tmp_path):
    """A truncated IDR (no reference) falls back to spatial
    extrapolation; output must not be black and decode must continue."""
    full = _i_frame(6)
    # find the IDR slice NAL (type 5) and truncate inside it
    idx = full.rfind(b"\x00\x00\x00\x01\x65")
    assert idx > 0
    stream = full[:idx + (len(full) - idx) * 2 // 3]
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all([Packet(data=stream, pts=0,
                                    time_base=Rational(1, 25))])
    assert len(frames) == 1
    y = np.asarray(frames[0].planes[0])
    assert y.std() > 1.0          # not a flat frame
