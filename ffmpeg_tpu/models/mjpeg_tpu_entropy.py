"""1080p-class MJPEG decode with the ENTROPY STAGE ON THE TPU.

The host's only per-frame work is destuffing the scan and splitting it
at restart markers (csrc mjpeg_split_segments_strided, ~0.3 ms/frame);
the raw segment bytes (~150 KB/frame instead of ~6 MB of coefficients)
ship to the device, where ops/huffman.jpeg_scan_decode9 decodes all
segments in parallel and one fused program does dequant + IDCT +
upsample + colorspace + resize. This is the pipeline for hosts whose
single CPU core cannot feed the chip (the usual TPU-VM shape).

Requires streams with restart markers and <= 9-bit Huffman codes — what
our encoder emits with huffman=optimal + restart_interval (both fully
standard JPEG; the reference decodes the same files).
"""

from __future__ import annotations

import ctypes
import functools
from dataclasses import dataclass

import numpy as np

from .. import native
from ..ops.huffman import (build_jpeg_luts9, jpeg_scan_decode9,
                           jpeg_scan_decode9_pl)
from ..ops.idct import jpeg_plane_reconstruct
from ..scale.ops import compile_ops
from ..scale.swscale import ScaleSpec, build_ops


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

    @property
    def mcus(self):
        return -(-self.width // 16), -(-self.height // 16)


def _build_program(spec: TpuEntropySpec, qy: np.ndarray, qc: np.ndarray):
    import jax
    import jax.numpy as jnp

    mcus_x, mcus_y = spec.mcus
    nmcu = mcus_x * mcus_y
    B = spec.batch
    L = B * nmcu
    KLONG = max(256, L // spec.long_frac)
    W, H = spec.width, spec.height
    ly, lx = mcus_y * 2, mcus_x * 2
    qyd = jnp.asarray(qy)
    qcd = jnp.asarray(qc)
    scale_fn = compile_ops(build_ops(ScaleSpec(
        src_w=W, src_h=H, src_fmt="yuv420p",
        dst_w=spec.out_w, dst_h=spec.out_h, dst_fmt=spec.out_fmt,
        filter=spec.filter, src_range=True, src_chroma_loc="center")))

    on_tpu = jax.devices()[0].platform not in ("cpu",)

    def run(rows, lens, luts):
        """rows (L, stride) u8 destuffed segments; lens (L,) i32;
        luts (B, 512, 12) i8 per-frame tables (DHTs may vary, e.g.
        huffman=optimal re-derives tables every frame)."""
        if on_tpu:
            # Pallas kernel: state + output resident in VMEM, lanes
            # sorted by length into uniform per-frame blocks
            # (see ops/huffman.py jpeg_scan_decode9_pl)
            out = jpeg_scan_decode9_pl(rows, lens, luts)
        else:
            outs = [jpeg_scan_decode9(rows[b * nmcu:(b + 1) * nmcu],
                                      jnp.ones(nmcu, bool), luts[b])
                    for b in range(B)]
            out = jnp.concatenate(outs)
        out = out.reshape(B, mcus_y, mcus_x, 6, 64)
        ycf = out[:, :, :, :4].reshape(B, mcus_y, mcus_x, 2, 2, 64) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(B, ly, lx, 64)
        y = jpeg_plane_reconstruct(ycf, qyd, H, W, scale=1)
        u = jpeg_plane_reconstruct(out[:, :, :, 4], qcd,
                                   H // 2, W // 2, scale=1)
        v = jpeg_plane_reconstruct(out[:, :, :, 5], qcd,
                                   H // 2, W // 2, scale=1)
        return scale_fn([y, u, v])

    return jax.jit(run), KLONG


class MjpegTpuEntropyPipeline:
    """Stateful batch decoder: feed scan packets, get scaled RGB batches."""

    def __init__(self, spec: TpuEntropySpec, first_packet: bytes):
        from ..codecs.mjpeg import _JpegState, _parse_until_scan
        self.spec = spec
        self._parse = _parse_until_scan
        self._State = _JpegState
        st = _JpegState()
        _parse_until_scan(first_packet, st)
        self._qy = st.qtabs[st.components[0].q_idx].astype(np.int32)
        self._qc = st.qtabs[st.components[1].q_idx].astype(np.int32)
        self.fn, self.klong = _build_program(spec, self._qy, self._qc)
        self.lib = native.get()
        mcus_x, mcus_y = spec.mcus
        self.nmcu = mcus_x * mcus_y
        L = spec.batch * self.nmcu
        self.rows = np.zeros((L, spec.stride), np.uint8)
        self.lens = np.zeros(L, np.int32)
        self.luts = np.zeros((spec.batch, 512, 12), np.int8)

    def prep_frame(self, data: bytes, slot: int) -> None:
        """Host work for one frame: headers + destuff/split into the
        batch buffer row range [slot*nmcu, (slot+1)*nmcu)."""
        st = self._State()
        off, _ = self._parse(data, st)
        qy = st.qtabs[st.components[0].q_idx].astype(np.int32)
        if not np.array_equal(qy, self._qy):
            raise ValueError("mjpeg_tpu_entropy: quant tables changed "
                             "mid-stream (rebuild the pipeline)")
        self.luts[slot] = build_jpeg_luts9(st)
        scan = data[off:]
        base = slot * self.nmcu
        n = self.lib.mjpeg_split_segments_strided(
            scan, len(scan),
            self.rows[base:].ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)),
            self.spec.stride, self.nmcu + 1,
            self.lens[base:].ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)))
        if n != self.nmcu:
            raise ValueError(f"segment split failed: {n}")

    def run_batch(self):
        """Decode the prepared batch; returns device output planes."""
        import jax
        return self.fn(jax.device_put(self.rows),
                       jax.device_put(self.lens),
                       jax.device_put(self.luts))
