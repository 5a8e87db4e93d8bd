"""Device-side segment-parallel JPEG Huffman decode (ops/huffman.py)
vs the host C++ scan decoder — coefficient-exact on real encoded frames."""

import ctypes

import numpy as np
import pytest

from ffmpeg_tpu import native
from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs.mjpeg import _JpegState, _parse_until_scan
from ffmpeg_tpu.filters import get_filter
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.ops.huffman import build_jpeg_luts, jpeg_scan_decode
from ffmpeg_tpu.scale.swscale import scale_frame


def _encode_frame(w, h, quality=85, restart_interval=1, seed=0):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="mjpeg",
                          width=w, height=h)
    enc = CodecContext.open_encoder(
        par, options={"quality": quality,
                      "restart_interval": restart_interval})
    src = get_filter("testsrc")(f"size={w}x{h}")
    frames = list(src.generate(seed + 1))
    yuv = scale_frame(frames[seed], w, h, "yuv420p", dst_range=True)
    enc.send_frame(yuv)
    return enc.receive_packet().data


@pytest.mark.parametrize("w,h,quality,ri", [
    (128, 96, 85, 1), (128, 96, 30, 1), (256, 128, 92, 2),
    (144, 112, 85, 4),
])
def test_onehot_fast_path_matches_host(w, h, quality, ri):
    """jpeg_scan_decode9 (one-hot/MXU path, <=9-bit optimal tables,
    strided segments) vs the host C++ decoder."""
    import jax
    import jax.numpy as jnp
    from ffmpeg_tpu.ops.huffman import build_jpeg_luts9, jpeg_scan_decode9

    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="mjpeg",
                          width=w, height=h)
    enc = CodecContext.open_encoder(
        par, options={"quality": quality, "restart_interval": ri,
                      "huffman": "optimal"})
    src = get_filter("testsrc")(f"size={w}x{h}")
    yuv = scale_frame(list(src.generate(1))[0], w, h, "yuv420p",
                      dst_range=True)
    enc.send_frame(yuv)
    data = enc.receive_packet().data
    st = _JpegState()
    off, _ = _parse_until_scan(data, st)
    scan = data[off:]
    mcus_x, mcus_y = -(-w // 16), -(-h // 16)
    nmcu = mcus_x * mcus_y
    nseg = -(-nmcu // ri)
    lib = native.get()
    STRIDE = 512
    rows = np.zeros((nseg, STRIDE), np.uint8)
    n = lib.mjpeg_split_segments_strided(
        scan, len(scan),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), STRIDE,
        nseg + 1, None)
    assert n == nseg, n

    lx, ly, cx, cy = mcus_x * 2, mcus_y * 2, mcus_x, mcus_y
    ys = np.zeros((ly, lx, 64), np.int16)
    us = np.zeros((cy, cx, 64), np.int16)
    vs = np.zeros((cy, cx, 64), np.int16)
    specs, ptrs = [], []
    for ci, comp in enumerate(st.components):
        bw = lx if comp.h == 2 else cx
        specs.append((comp.dc_tab, comp.ac_tab, comp.h, comp.v, bw))
        ptrs.append((ys, us, vs)[ci].ctypes.data_as(
            ctypes.POINTER(ctypes.c_int16)))
    spec_arr = (ctypes.c_int * (5 * len(specs)))(
        *[v for s in specs for v in s])
    out_ptrs = (ctypes.POINTER(ctypes.c_int16) * len(ptrs))(*ptrs)
    r = lib.mjpeg_decode_scan(
        scan, len(scan), st.dc_counts.tobytes(), st.dc_values.tobytes(),
        st.ac_counts.tobytes(), st.ac_values.tobytes(), spec_arr,
        len(specs), mcus_x, mcus_y, st.restart_interval, 64, out_ptrs)
    assert r == 0, r

    lut9 = build_jpeg_luts9(st)
    blk_end = jnp.asarray(
        np.minimum(ri, nmcu - np.arange(nseg) * ri) * 6, np.int32)
    out = jax.jit(jpeg_scan_decode9, static_argnames=("blocks_per_seg",))(
        jnp.asarray(rows), jnp.ones(nseg, bool), jnp.asarray(lut9),
        blocks_per_seg=6 * ri, blk_end=blk_end)
    out = np.asarray(out).reshape(nseg * ri, 6, 64)[:nmcu]
    got_y = out[:, :4].reshape(mcus_y, mcus_x, 2, 2, 64) \
        .transpose(0, 2, 1, 3, 4).reshape(ly, lx, 64)
    np.testing.assert_array_equal(got_y, ys.astype(np.int32))
    np.testing.assert_array_equal(out[:, 4].reshape(cy, cx, 64),
                                  us.astype(np.int32))
    np.testing.assert_array_equal(out[:, 5].reshape(cy, cx, 64),
                                  vs.astype(np.int32))


def test_tpu_entropy_pipeline_end_to_end():
    """models/mjpeg_tpu_entropy: device-side Huffman + decode + scale,
    full resolution — matches the host-entropy decode of the same frame
    (both feed the same exact-integer reconstruction)."""
    import jax
    from ffmpeg_tpu.core.packet import Packet
    from ffmpeg_tpu.models.mjpeg_tpu_entropy import (
        MjpegTpuEntropyPipeline, TpuEntropySpec)
    from ffmpeg_tpu.scale.swscale import scale_frame as scale

    w, h = 256, 192
    par9 = CodecParameters(codec_type=MediaType.VIDEO, codec_id="mjpeg",
                           width=w, height=h)
    enc = CodecContext.open_encoder(
        par9, options={"quality": 88, "restart_interval": 1,
                       "huffman": "optimal"})
    src = get_filter("testsrc")(f"size={w}x{h}")
    yuv = scale_frame(list(src.generate(1))[0], w, h, "yuv420p",
                      dst_range=True)
    enc.send_frame(yuv)
    data = enc.receive_packet().data
    spec = TpuEntropySpec(w, h, 64, 64, batch=2, stride=512)
    pipe = MjpegTpuEntropyPipeline(spec, data)
    pipe.prep_frame(data, 0)
    pipe.prep_frame(data, 1)
    out = pipe.run_batch()
    rgb = np.asarray(out[0])

    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="mjpeg")
    dec = CodecContext.open_decoder(par)
    (f,) = dec.decode_all([Packet(data=data, pts=0)])
    want = scale(f.numpy(), 64, 64, "rgb24", src_range=True)
    wrgb = np.asarray(want.planes[0]).reshape(64, 64, -1)
    ours = rgb[0].reshape(64, 64, -1) if rgb.ndim == 3 else rgb[0]
    d = np.abs(ours.astype(np.int32).reshape(-1)
               - wrgb.astype(np.int32).reshape(-1))
    mse = (d.astype(np.float64) ** 2).mean()
    psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
    assert psnr > 45, psnr


@pytest.mark.parametrize("w,h,quality,ri", [
    (128, 96, 85, 1), (128, 96, 30, 1), (256, 128, 92, 2),
    (144, 112, 85, 4),
])
def test_device_huffman_matches_host(w, h, quality, ri):
    data = _encode_frame(w, h, quality=quality, restart_interval=ri)
    st = _JpegState()
    off, _ = _parse_until_scan(data, st)
    comps = st.components
    assert comps[0].h == 2 and comps[0].v == 2
    mcus_x, mcus_y = -(-w // 16), -(-h // 16)
    lx, ly = mcus_x * 2, mcus_y * 2
    cx, cy = mcus_x, mcus_y
    lib = native.get()

    # host reference decode
    ys = np.zeros((ly, lx, 64), np.int16)
    us = np.zeros((cy, cx, 64), np.int16)
    vs = np.zeros((cy, cx, 64), np.int16)
    specs, ptrs = [], []
    for ci, comp in enumerate(comps):
        bw = lx if comp.h == 2 else cx
        specs.append((comp.dc_tab, comp.ac_tab, comp.h, comp.v, bw))
        ptrs.append((ys, us, vs)[ci].ctypes.data_as(
            ctypes.POINTER(ctypes.c_int16)))
    spec_arr = (ctypes.c_int * (5 * len(specs)))(
        *[v for s in specs for v in s])
    out_ptrs = (ctypes.POINTER(ctypes.c_int16) * len(ptrs))(*ptrs)
    scan = data[off:]
    r = lib.mjpeg_decode_scan(
        scan, len(scan), st.dc_counts.tobytes(), st.dc_values.tobytes(),
        st.ac_counts.tobytes(), st.ac_values.tobytes(), spec_arr,
        len(specs), mcus_x, mcus_y, st.restart_interval, 64, out_ptrs)
    assert r == 0, r

    # split segments
    cap = len(scan) + 16
    buf = np.zeros(cap, np.uint8)
    max_segs = mcus_x * mcus_y + 2
    offs = np.zeros(max_segs + 1, np.int32)
    nseg = lib.mjpeg_split_segments(
        scan, len(scan), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_segs)
    assert nseg == -(-mcus_x * mcus_y // ri), nseg

    luts = build_jpeg_luts(st)
    import jax
    import jax.numpy as jnp
    nmcu = mcus_x * mcus_y
    bitpos = jnp.asarray(offs[:nseg] * 8)
    valid = jnp.ones(nseg, bool)
    blk_end = jnp.asarray(
        np.minimum(ri, nmcu - np.arange(nseg) * ri) * 6, np.int32)
    out = jax.jit(jpeg_scan_decode, static_argnames=("blocks_per_seg",))(
        jnp.asarray(buf), bitpos, valid, jnp.asarray(luts),
        blocks_per_seg=6 * ri, blk_end=blk_end)
    out = np.asarray(out).reshape(nseg * ri, 6, 64)[:nmcu]

    got_y = out[:, :4].reshape(mcus_y, mcus_x, 2, 2, 64) \
        .transpose(0, 2, 1, 3, 4).reshape(ly, lx, 64)
    got_u = out[:, 4].reshape(cy, cx, 64)
    got_v = out[:, 5].reshape(cy, cx, 64)
    np.testing.assert_array_equal(got_y, ys.astype(np.int32))
    np.testing.assert_array_equal(got_u, us.astype(np.int32))
    np.testing.assert_array_equal(got_v, vs.astype(np.int32))


def test_pallas_scan_decode_interpret_matches_xla():
    """jpeg_scan_decode9_pl (the Pallas TPU kernel, run in interpreter
    mode on CPU) must agree with the XLA jpeg_scan_decode9 path,
    including per-frame Huffman tables and the length-sorted lanes."""
    import jax
    import jax.numpy as jnp
    from ffmpeg_tpu.ops.huffman import (build_jpeg_luts9,
                                        jpeg_scan_decode9,
                                        jpeg_scan_decode9_pl)
    from ffmpeg_tpu import native
    import ctypes

    w, h = 96, 64
    nmcu = (w // 16) * (h // 16)        # 24 lanes/frame
    lib = native.get()
    S = 192
    F = 2
    rows = np.zeros((F * nmcu, S), np.uint8)
    lens = np.zeros(F * nmcu, np.int32)
    luts = []
    for fidx, q in enumerate((90, 35)):   # different tables per frame
        par = CodecParameters(codec_type=MediaType.VIDEO,
                              codec_id="mjpeg", width=w, height=h)
        enc = CodecContext.open_encoder(
            par, options={"quality": q, "restart_interval": 1,
                          "huffman": "optimal"})
        src = get_filter("testsrc")(f"size={w}x{h}")
        yuv = scale_frame(list(src.generate(1))[0], w, h, "yuv420p",
                          dst_range=True)
        enc.send_frame(yuv)
        data = enc.receive_packet().data
        st = _JpegState()
        off, _ = _parse_until_scan(data, st)
        scan = data[off:]
        base = fidx * nmcu
        n = lib.mjpeg_split_segments_strided(
            scan, len(scan),
            rows[base:].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            S, nmcu + 1,
            lens[base:].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        assert n == nmcu
        luts.append(build_jpeg_luts9(st))

    ref = np.concatenate([
        np.asarray(jpeg_scan_decode9(rows[f * nmcu:(f + 1) * nmcu],
                                     jnp.ones(nmcu, bool),
                                     jnp.asarray(luts[f])))
        for f in range(F)])
    out = np.asarray(jpeg_scan_decode9_pl(
        rows, lens, np.stack(luts), interpret=True))
    assert np.array_equal(out, ref)

    # cur0 path (packed wire format v2): shift every lane right by a
    # per-lane byte offset and hand the kernel the residual bit cursor,
    # as models/mjpeg_tpu_entropy does after its window gather.
    rng = np.random.default_rng(7)
    offs = rng.integers(0, 64, rows.shape[0]).astype(np.int32)
    rows2 = np.zeros((rows.shape[0], S + 64), np.uint8)
    for i, o in enumerate(offs):
        rows2[i, o:o + S] = rows[i]
    out2 = np.asarray(jpeg_scan_decode9_pl(
        rows2, lens, np.stack(luts), interpret=True, cur0=offs * 8))
    assert np.array_equal(out2, ref)
