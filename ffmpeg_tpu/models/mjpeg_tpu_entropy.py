"""1080p-class MJPEG decode with the ENTROPY STAGE ON THE TPU.

The host's only per-frame work is destuffing the scan and splitting it
at restart markers (csrc mjpeg_split_segments, ~0.3 ms/frame); the raw
segment bytes ship to the device, where ops/huffman.jpeg_scan_decode9
decodes all segments in parallel and one fused program does dequant +
IDCT + upsample + colorspace + resize. This is the pipeline for hosts
whose single CPU core cannot feed the chip (the usual TPU-VM shape).

Wire format (v2 — sized for hosts behind a slow/high-latency PCIe or
tunnel link; one contiguous uint8 region per frame, so a whole window
of batches ships as ONE transfer):

    region[0 : 2*nmcu]              u16le per-segment byte lengths
    region[2*nmcu : 2*nmcu+6144]    (512,12) int8 Huffman LUT
                                    (build_jpeg_luts9 — DHTs may vary
                                    per frame with huffman=optimal)
    region[hdr : ]                  destuffed segments, tightly packed

The device reassembles the strided (L, S) lane layout with one gather
(segment starts = exclusive cumsum of the lens), so the transfer costs
~the entropy-coded size (~150 KB/frame) instead of the ~1.6 MB/frame
the padded lane layout used to ship.  Requires streams with restart
markers and <= 9-bit Huffman codes — what our encoder emits with
huffman=optimal + restart_interval (both fully standard JPEG; the
reference decodes the same files).
"""

from __future__ import annotations

import ctypes
import functools
from dataclasses import dataclass

import numpy as np

from .. import native
from ..ops.huffman import (build_jpeg_luts9, jpeg_scan_decode9,
                           jpeg_scan_decode9_pl)

_LUT_BYTES = 512 * 12


@dataclass(frozen=True)
class TpuEntropySpec:
    width: int
    height: int
    out_w: int
    out_h: int
    batch: int = 8
    stride: int = 192            # bytes per segment lane (>= maxseg + 5)
    long_frac: int = 16          # 1/long_frac of lanes go to the long call
    out_fmt: str = "rgb24"
    filter: str = "bicubic"
    packed_cap: int = 0          # bytes per frame region; 0 = auto from
                                 # the first packet (x1.3 + slack)
    lut_bits: int = 9            # max Huffman code length in the stream
                                 # (8 halves the kernel's one-hot width;
                                 # encode with max_code_len=8)

    @property
    def mcus(self):
        return -(-self.width // 16), -(-self.height // 16)


def _fused_operators(spec: TpuEntropySpec, qy: np.ndarray,
                     qc: np.ndarray):
    """Compose dequant + 8x8 IDCT + chroma upsample + resize into two
    per-axis operator tensors per plane (the swscale op-fusion idea
    carried all the way into the DCT domain; cf. libswscale/graph.c
    pass fusion and the `lowres` DCT-domain scalers in mjpegdec.c —
    here with ALL 64 coefficients, so it is the exact full-resolution
    linear map, just never materialized at 1920x1080).

    Returns (Ky, Ly, Kc, Lc, tail_ops, (b_offsets, a_scales)) where
    the 224-line luma operators fold the 2x2 MCU block layout so the
    entropy output (B, my, mx, 4*64) contracts with NO transpose:

        plane224[o, p] = sum_{m,n,z} C[m,n,z] * K[o,m,z] * L[p,n,z]
    """
    from ..ops.idct import ZIGZAG, _dct8_matrix
    from ..scale import ops as sops
    from ..scale.swscale import ScaleSpec, build_ops

    OUTW, OUTH = spec.out_w, spec.out_h
    mcus_x, mcus_y = spec.mcus
    oplist = build_ops(ScaleSpec(
        src_w=spec.width, src_h=spec.height, src_fmt="yuv420p",
        dst_w=OUTW, dst_h=OUTH, dst_fmt=spec.out_fmt,
        filter=spec.filter, src_range=True, src_chroma_loc="center"))
    if not (isinstance(oplist[0], sops.ToFloat)
            and isinstance(oplist[1], sops.ResizeAxis)
            and oplist[1].axis == -2
            and isinstance(oplist[2], sops.ResizeAxis)
            and oplist[2].axis == -1):
        raise NotImplementedError("fused path needs the standard "
                                  "ToFloat/ResizeV/ResizeH op prefix")
    tofloat, res_v, res_h = oplist[0], oplist[1], oplist[2]
    tail = oplist[3:]
    A = _dct8_matrix()                     # A[u, x]
    uidx, vidx = ZIGZAG // 8, ZIGZAG % 8

    def build_kl(mv, mh, q, rv, rh, outh, outw):
        mvp = np.zeros((outh, rv, 8))
        mvp.reshape(outh, -1)[:, :mv.shape[1]] = mv
        mhp = np.zeros((outw, rh, 8))
        mhp.reshape(outw, -1)[:, :mh.shape[1]] = mh
        av = np.einsum("orx,ux->oru", mvp, A)
        ah = np.einsum("ocx,vx->ocv", mhp, A)
        return av[:, :, uidx] * q[None, None, :], ah[:, :, vidx]

    avy, ahy = build_kl(res_v.matrices[0], res_h.matrices[0],
                        qy.astype(np.float64), mcus_y * 2, mcus_x * 2,
                        OUTH, OUTW)
    ky = np.zeros((OUTH, mcus_y, 4, 64))
    ly = np.zeros((OUTW, mcus_x, 4, 64))
    for k in range(4):                     # fold 2x2 MCU block layout
        ky[:, :, k, :] = avy[:, k // 2::2, :]
        ly[:, :, k, :] = ahy[:, k % 2::2, :]
    kc, lc = build_kl(res_v.matrices[1], res_h.matrices[1],
                      qc.astype(np.float64), mcus_y, mcus_x, OUTH, OUTW)
    return (ky.reshape(OUTH, mcus_y, 256).astype(np.float32),
            ly.reshape(OUTW, mcus_x, 256).astype(np.float32),
            kc.astype(np.float32), lc.astype(np.float32),
            tail, (tofloat.offsets, tofloat.scales))


def _build_program(spec: TpuEntropySpec, cap: int,
                   qy: np.ndarray, qc: np.ndarray):
    import jax
    import jax.numpy as jnp

    mcus_x, mcus_y = spec.mcus
    nmcu = mcus_x * mcus_y
    B = spec.batch
    L = B * nmcu
    S = spec.stride
    hdr = 2 * nmcu + _LUT_BYTES

    ky, ly, kc, lc, tail, (b_ofs, a_scl) = _fused_operators(spec, qy, qc)
    kyd, lyd, kcd, lcd = map(jnp.asarray, (ky, ly, kc, lc))

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    PREC = jax.lax.Precision.HIGHEST

    G = 64                       # window alignment granularity (bytes)
    S2 = G + S                   # lane row incl. alignment slack

    def run(regions):
        """regions (B, cap) u8 — one packed frame per row (see module
        docstring for the layout).

        Expansion strategy: element-wise XLA gathers cost ~100 ms for
        the 12.5 MB lane layout on TPU, but whole-row take_along_axis
        is fast. So: build overlapping S2-byte windows at G=64-byte
        steps with static slices, row-gather ONE window per segment
        (start >> 6), and hand the decoder the residual bit offset
        (start & 63) * 8 as its initial bit cursor."""
        lw = regions[:, :2 * nmcu].reshape(B, nmcu, 2).astype(jnp.int32)
        lens = lw[..., 0] | (lw[..., 1] << 8)            # (B, nmcu)
        luts = jax.lax.bitcast_convert_type(
            regions[:, 2 * nmcu:hdr], jnp.int8).reshape(B, 512, 12)
        # tight packing => segment starts are the exclusive cumsum
        starts = jnp.cumsum(lens, axis=1) - lens + hdr
        f64 = regions.reshape(B, cap // G, G)
        nwin = cap // G - (S2 // G - 1)
        win = jnp.concatenate([f64[:, c:c + nwin] for c in range(S2 // G)],
                              axis=2)                    # (B, nwin, S2)
        win_idx = jnp.clip(starts >> 6, 0, nwin - 1)
        rows = jnp.take_along_axis(win, win_idx[:, :, None],
                                   axis=1).reshape(L, S2)
        cur0 = ((starts & (G - 1)) * 8).reshape(L)
        lensf = lens.reshape(L)
        if on_tpu:
            # Pallas kernel: state + output resident in VMEM, lanes
            # sorted by length into uniform per-frame blocks
            # (see ops/huffman.py jpeg_scan_decode9_pl). For <=8-bit
            # streams every adjacent LUT row pair is identical, so the
            # kernel reads the 256-row half-size table (half the
            # one-hot VMEM traffic per symbol).
            kl = luts[:, ::2] if spec.lut_bits == 8 else luts
            out = jpeg_scan_decode9_pl(rows, lensf, kl, cur0=cur0)
        else:
            outs = [jpeg_scan_decode9(rows[b * nmcu:(b + 1) * nmcu],
                                      jnp.ones(nmcu, bool), luts[b],
                                      cur0=cur0[b * nmcu:(b + 1) * nmcu])
                    for b in range(B)]
            out = jnp.concatenate(outs)
        out = out.reshape(B, mcus_y, mcus_x, 6, 64).astype(jnp.float32)
        yc = out[:, :, :, :4].reshape(B, mcus_y, mcus_x, 256)

        def p224(coef, k, l):
            # n-first: the (b,m,p,z) intermediate is 3.6x smaller than
            # the (b,o,n,z) one and step 2 contracts the large (m,z)
            t = jnp.einsum("bmnz,pnz->bmpz", coef, l, precision=PREC)
            return jnp.einsum("bmpz,omz->bop", t, k,
                              precision=PREC) + 128.0

        comps = [p224(yc, kyd, lyd),
                 p224(out[:, :, :, 4], kcd, lcd),
                 p224(out[:, :, :, 5], kcd, lcd)]
        comps = [(c - b) * (1.0 / a)
                 for c, b, a in zip(comps, b_ofs, a_scl)]
        for op in tail:
            comps = op.apply(comps)
        return comps

    return jax.jit(run)


class MjpegTpuEntropyPipeline:
    """Stateful batch decoder: feed scan packets, get scaled RGB batches.

    `prep_frame` stages one frame into `self.regions[slot]`; `run_batch`
    decodes the staged batch.  Callers that overlap host prep with
    device compute can swap `self.regions` for ring/window buffers of
    shape (..., batch, cap) and ship a whole window with one
    jax.device_put (see bench.py).
    """

    def __init__(self, spec: TpuEntropySpec, first_packet: bytes):
        from ..codecs.mjpeg import _JpegState, _parse_until_scan
        self.spec = spec
        self._parse = _parse_until_scan
        self._State = _JpegState
        st = _JpegState()
        off, _ = _parse_until_scan(first_packet, st)
        self._qy = st.qtabs[st.components[0].q_idx].astype(np.int32)
        self._qc = st.qtabs[st.components[1].q_idx].astype(np.int32)
        mcus_x, mcus_y = spec.mcus
        self.nmcu = mcus_x * mcus_y
        self.hdr = 2 * self.nmcu + _LUT_BYTES
        scan_len = len(first_packet) - off
        cap = spec.packed_cap or (
            self.hdr + int(scan_len * 1.3) + 4096)
        self.cap = -(-cap // 128) * 128
        self.fn = _build_program(spec, self.cap, self._qy, self._qc)
        self.lib = native.get()
        self.regions = np.zeros((spec.batch, self.cap), np.uint8)
        self._offs = np.zeros(self.nmcu + 2, np.int32)
        self._fn_window = {}
        self._lut_cache = {}

    def fn_window(self, nbatches: int):
        """One jitted dispatch for a whole (nbatches, batch, cap) window
        — lax.map over batches so VMEM stays bounded but the host pays a
        single dispatch per window (the tunnel's per-op latency is the
        tax this amortises)."""
        if nbatches not in self._fn_window:
            import jax
            from jax import lax
            fn = self.fn
            self._fn_window[nbatches] = jax.jit(
                lambda w: lax.map(fn, w))
        return self._fn_window[nbatches]

    def prep_frame(self, data: bytes, slot: int,
                   regions: np.ndarray | None = None) -> None:
        """Host work for one frame: headers + destuff/split packed into
        region `slot` of `regions` (default self.regions)."""
        if regions is None:
            regions = self.regions
        st = self._State()
        off, _ = self._parse(data, st)
        qy = st.qtabs[st.components[0].q_idx].astype(np.int32)
        if not np.array_equal(qy, self._qy):
            raise ValueError("mjpeg_tpu_entropy: quant tables changed "
                             "mid-stream (rebuild the pipeline)")
        region = regions[slot]
        # LUT build is ~0.2 ms; frames usually repeat DHTs, so cache on
        # the raw table bytes (bounded — JPEG DHTs are tiny)
        key = (st.dc_counts.tobytes() + st.dc_values.tobytes()
               + st.ac_counts.tobytes() + st.ac_values.tobytes())
        lut = self._lut_cache.get(key)
        if lut is None:
            lut = build_jpeg_luts9(st).view(np.uint8).reshape(-1)
            if len(self._lut_cache) > 64:
                self._lut_cache.clear()
            self._lut_cache[key] = lut
        region[2 * self.nmcu:self.hdr] = lut
        scan = data[off:]
        dst = region[self.hdr:]
        n = self.lib.mjpeg_split_segments(
            scan, len(scan),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(dst),
            self._offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.nmcu)
        if n != self.nmcu:
            raise ValueError(
                f"segment split failed: {n} (packed_cap too small for "
                f"this frame?)" if n < 0 else f"segment count {n} != "
                f"{self.nmcu}")
        lens = np.diff(self._offs[:self.nmcu + 1])
        if lens.max(initial=0) > self.spec.stride - 5:
            raise ValueError("segment longer than stride - 5 "
                             "(increase TpuEntropySpec.stride)")
        if self.hdr + self._offs[self.nmcu] > self.cap - 64 - \
                self.spec.stride:
            raise ValueError("packed frame too close to region end "
                             "(increase TpuEntropySpec.packed_cap)")
        region[:2 * self.nmcu] = \
            lens.astype(np.uint16).view(np.uint8).reshape(-1)

    def run_batch(self):
        """Decode the prepared batch; returns device output planes."""
        import jax
        return self.fn(jax.device_put(self.regions))
