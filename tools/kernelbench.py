#!/usr/bin/env python
"""Per-kernel benchmark runner (analog of checkasm --bench): times each TPU
kernel with realistic shapes on the current default device and prints a
table of per-call wall time + achieved throughput. Run on TPU (default) or
CPU (--cpu)."""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    """Time fn with inputs pre-placed on device (kernel time, not PCIe).
    Alternates two input sets so runtimes cannot memoize identical calls."""
    import jax
    import numpy as _np
    sets = []
    for k in range(2):
        alt = []
        for a in args:
            b = _np.asarray(a).copy()
            if b.size and k:
                flat = b.reshape(-1)
                flat[0] = flat[0] ^ 1 if b.dtype.kind in "iu" else flat[0] + 1
            alt.append(jax.device_put(b))
        jax.block_until_ready(alt)
        sets.append(alt)
    for _ in range(warmup):
        r = fn(*sets[0])
    jax.block_until_ready(r)
    t0 = time.monotonic()
    out = []
    for i in range(n):
        out.append(fn(*sets[i & 1]))
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from ffmpeg_tpu.ops import tx, me, mc
    from ffmpeg_tpu.ops.idct import jpeg_block_transform
    from ffmpeg_tpu.scale.swscale import Scaler

    print(f"device: {jax.devices()[0]}")
    rows = []

    # 8x8 IDCT plane reconstruction, 1080p luma (batch 8)
    coeffs = np.random.default_rng(0).integers(
        -128, 128, (8, 135, 240, 64)).astype(np.int16)
    q = np.ones(64, np.int32) * 16
    f = jax.jit(lambda c, q: jpeg_block_transform(c, q, 1080, 1920))
    dt = timeit(f, coeffs, q)
    rows.append(("jpeg idct+reassemble 1080p x8", dt,
                 f"{8 / dt:.0f} frames/s"))

    # scaler 1080p->224 rgb (batch 8)
    sc = Scaler(src_w=1920, src_h=1080, src_fmt="yuv420p",
                dst_w=224, dst_h=224, dst_fmt="rgb24")
    y = np.zeros((8, 1080, 1920), np.uint8)
    u = np.zeros((8, 540, 960), np.uint8)
    v = np.zeros((8, 540, 960), np.uint8)
    dt = timeit(lambda a, b, c: sc.run([a, b, c]), y, u, v)
    rows.append(("scale 1080p->224 rgb24 x8", dt, f"{8 / dt:.0f} frames/s"))

    # MDCT 1024 batched x1024
    x = np.zeros((1024, 2048), np.float32)
    fmdct = jax.jit(lambda x: tx.mdct(x, 1024))
    dt = timeit(fmdct, x)
    rows.append(("mdct1024 x1024", dt, f"{1024 / dt / 1e3:.0f} k transforms/s"))

    # FFT 4096 (4-step) x256
    z = np.zeros((256, 4096, 2), np.float32)
    ffft = jax.jit(tx.tx_init("fft", 4096))
    dt = timeit(ffft, z)
    rows.append(("fft4096 x256", dt, f"{256 / dt / 1e3:.1f} k transforms/s"))

    # motion search 1080p, +-8, 16x16
    cur = np.zeros((1088, 1920), np.float32)
    ref = np.zeros((1088, 1920), np.float32)
    dt = timeit(lambda a, b: me.motion_search(a, b, 16, 8), cur, ref)
    mbs = (1088 // 16) * (1920 // 16)
    rows.append(("full-search SAD 1080p +-8", dt, f"{mbs / dt / 1e6:.1f} M MB/s"))

    # qpel MC 1080p
    mvs = np.zeros((68, 120, 2), np.int32)
    fmc = jax.jit(lambda r, m: mc.mc_blocks(r, m, 16))
    dt = timeit(fmc, ref, mvs)
    rows.append(("qpel MC 1080p", dt, f"{1 / dt:.0f} frames/s"))

    print(f"{'kernel':<36}{'ms/call':>10}   throughput")
    for name, dt, thr in rows:
        print(f"{name:<36}{dt * 1e3:>10.2f}   {thr}")


if __name__ == "__main__":
    main()
