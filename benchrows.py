"""Secondary bench rows (BASELINE.md rows 3-6): HEVC/VP9 device
reconstruction, the AAC->16k-mono audio frontend, and the filter-graph
dataloader.  Each row returns a dict merged into bench.py's
extra["secondary"], or an {"error": ...} stub — a failing row must
never take down the headline metric.

CPU denominators are PINNED in tests/data/cpu_baseline.json (measured
best-of-N against the locally built reference, tools/pin_cpu_baseline
discipline).  The recon rows measure the DEVICE REPLAY stage (the
recorded reconstruction program: MC + residual + intra wavefront,
h2d included) — host entropy parse is excluded and the comparison
field says so; the reference number is its full single-thread decode
of the same committed stream.
"""

from __future__ import annotations

import json
import statistics
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
BENCH_DATA = REPO / "tests" / "data" / "bench"
MIN_MEASURE_S = 10.0


def _pinned(key):
    try:
        d = json.loads(
            (REPO / "tests" / "data" / "cpu_baseline.json").read_text())
        return float(d.get(key, 0.0))
    except Exception:                     # noqa: BLE001
        return 0.0


def _stage_dpb(prepared, n_dpb):
    """device_put the DPB planes once (they are device-resident in a
    streaming decoder; only the per-frame work tensors arrive fresh)."""
    import jax
    out = []
    for fn, args in prepared:
        staged = tuple(jax.device_put(a) for a in args[:n_dpb])
        out.append((fn, staged + tuple(args[n_dpb:])))
    return out


def _replay(prepared):
    """Execute every prepared frame program (h2d of the work tensors +
    device compute), forcing completion with one tiny fetch per frame
    (the tunnel acks dispatches early; consumers downstream are
    on-device, so full-plane d2h is not part of this stage)."""
    outs = [fn(*args) for fn, args in prepared]
    for o in outs:
        np.asarray(o[0][:1, :8])


def _measure_loop(fn, unit_count, min_s=MIN_MEASURE_S, max_windows=24):
    """fn() = one replay window of unit_count items; returns
    (median units/s, spread, windows)."""
    fn()                                  # compile / warm
    fn()
    windows = []
    t0 = time.monotonic()
    while True:
        tw = time.monotonic()
        fn()
        dt = time.monotonic() - tw
        windows.append(unit_count / dt)
        if (time.monotonic() - t0 >= min_s and len(windows) >= 5) \
                or len(windows) >= max_windows:
            break
    med = statistics.median(windows)
    spread = (max(windows) - min(windows)) / med if med else 1.0
    return med, spread, windows


# -- HEVC / VP9 device recon replay ----------------------------------------

def recon_row_vp9():
    """FULL VP9 decode (r5): C++ entropy parse + windowed device
    replay with fused in-loop deblock, DPB device-resident — on the
    100-frame committed 1080p stream, byte-exact vs the reference
    (tests + the emit_planes gate in models/vp9_tpu.py)."""
    path = BENCH_DATA / "vp9_1080p_100.ivf"
    if not path.exists():
        return {"error": "no bench stream"}
    from ffmpeg_tpu.models.vp9_tpu import Vp9TpuDecoder
    data = path.read_bytes()
    pos, frames = 32, []
    while pos + 12 <= len(data):
        sz = int.from_bytes(data[pos:pos + 4], "little")
        frames.append(data[pos + 12:pos + 12 + sz])
        pos += 12 + sz
    dec = Vp9TpuDecoder()
    dec.decode(frames, stats={})          # compile + warm
    rates, comps = [], []
    t0 = time.monotonic()
    while True:
        st = {}
        tw = time.monotonic()
        dec.decode(frames, stats=st)
        rates.append(st["frames"] / (time.monotonic() - tw))
        comps.append(st)
        if time.monotonic() - t0 > MIN_MEASURE_S or len(rates) >= 4:
            break
    med = statistics.median(rates)
    spread = (max(rates) - min(rates)) / med if med else 1.0
    n = comps[-1]["frames"]
    pin = _pinned("vp9_1080p_100")
    return {
        "full_decode_fps": round(med, 1),
        "cpu_pinned_full_decode_fps": pin,
        "vs_cpu": round(med / pin, 2) if pin else 0.0,
        "spread": round(spread, 3),
        "host_parse_ms_per_frame":
            round(comps[-1]["parse_s"] / n * 1e3, 1),
        "build_ms_per_frame":
            round(comps[-1]["build_s"] / n * 1e3, 1),
        "device_ms_per_frame":
            round(comps[-1]["device_s"] / n * 1e3, 1),
        "frames": n,
        "comparison": "FULL decode (C++ tile parse + windowed device "
                      "recon + fused device deblock; output stays "
                      "device-resident) vs pinned cpu full decode of "
                      "the same 100-frame stream (r4: parse alone was "
                      "31.7 s/frame and replay 0.8 f/s on 3 frames)",
    }


def encode_hotloop_row():
    """BASELINE row 6: the encode hot loop — full-search SAD motion
    search (Pallas strip kernel), bounded qpel MC, residual FDCT +
    quant — MB/s on 1080p, vs the pinned full reference mpeg4 encode
    (which uses EPZS ME + entropy; scope noted in `comparison`)."""
    import jax
    import jax.numpy as jnp
    from ffmpeg_tpu.ops import idct, mc, me

    H, W, B = 1088, 1920, 16
    rng = np.random.default_rng(3)
    cur = rng.integers(0, 256, (H, W)).astype(np.float32)
    ref = np.roll(cur, (3, -5), (0, 1)) + \
        rng.normal(0, 2, (H, W)).astype(np.float32)

    @jax.jit
    def hot(cur, ref):
        mvs, cost = me.motion_search(cur, ref, B, 8)
        pred = mc.mc_blocks_bounded(ref, mvs * 4, B, max_disp=12)
        resid = cur - pred
        blocks = resid.reshape(H // 8, 8, W // 8, 8) \
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coef = idct.fdct8x8(blocks)
        q = jnp.round(coef / 16.0)
        return jnp.sum(jnp.abs(q)) + jnp.sum(cost)

    dc, dr = jax.device_put(cur), jax.device_put(ref)
    float(hot(dc, dr))

    def one():
        float(hot(dc, dr))

    mbs = (H // B) * (W // B)
    med, spread, _ = _measure_loop(one, mbs, min_s=5.0, max_windows=40)
    pin = _pinned("encode_mbps")
    return {
        "mb_per_s": round(med, 0),
        "cpu_pinned_mb_per_s": pin,
        "vs_cpu": round(med / pin, 2) if pin else 0.0,
        "spread": round(spread, 3),
        "comparison": "device ME(+-8 full search)+qpel MC+FDCT+quant "
                      "hot loop, MB/s vs pinned cpu ffmpeg mpeg4 "
                      "encode (EPZS ME + full entropy) at 1080p",
    }


def recon_row_hevc():
    path = BENCH_DATA / "hevc_1080p.hevc"
    if not path.exists():
        return {"error": "no bench stream"}
    from ffmpeg_tpu.codecs import CodecContext
    from ffmpeg_tpu.codecs.hevc import recon_tpu as RT
    from ffmpeg_tpu.core.packet import Packet
    from ffmpeg_tpu.io.stream import CodecParameters, MediaType
    data = path.read_bytes()
    captured = []
    real = RT.reconstruct
    RT.reconstruct = lambda dec, rec: (captured.append((dec, rec)),
                                       real(dec, rec))[1]
    try:
        par = CodecParameters(codec_type=MediaType.VIDEO,
                              codec_id="hevc")
        d = CodecContext.open_decoder(par,
                                      options={"device_recon": True})
        t0 = time.monotonic()
        d.decode_all([Packet(data=data, pts=0)])
        parse_s = time.monotonic() - t0
    finally:
        RT.reconstruct = real
    if not captured:
        return {"error": "no frames captured"}
    prepared = _stage_dpb([RT.prepare(dec, rec) for dec, rec in captured], 3)
    med, spread, _ = _measure_loop(
        lambda: _replay(prepared), len(captured))
    pin = _pinned("hevc_1080p")
    return {
        "device_recon_fps": round(med, 1),
        "cpu_pinned_full_decode_fps": pin,
        "vs_cpu": round(med / pin, 2) if pin else 0.0,
        "spread": round(spread, 3),
        "host_parse_s_per_frame": round(parse_s / len(captured), 1),
        "comparison": "device recon replay vs pinned cpu full decode "
                      "of the same stream",
    }


# -- audio frontend: AAC 48k stereo -> 16k mono (BASELINE row 3) ------------

def audio_frontend_row():
    path = BENCH_DATA / "aac48k.adts"
    if not path.exists():
        return {"error": "no bench stream"}
    from ffmpeg_tpu.codecs import CodecContext
    from ffmpeg_tpu.io import open_input
    from ffmpeg_tpu.resample.swresample import SwrContext

    d = open_input(str(path))
    # bound the row's runtime: ~4s of audio per pass (the decoder
    # dispatches per-frame; on a degraded tunnel a full 20s pass can
    # take minutes and the bench must stay inside its budget)
    pkts = list(d.packets())[:200]
    st = d.streams[0]

    def one_pass():
        # r5: batched utterance decode — host entropy for all frames,
        # ONE device IMDCT per window class, one resample call over
        # the whole utterance (r4 dispatched the IMDCT per frame and
        # ran at 0.2x realtime on tunnel latency alone)
        dec = CodecContext.open_decoder(st.codecpar)
        frames = dec.decode_frames(pkts)
        rs = SwrContext(frames[0].sample_rate, "stereo", "fltp",
                        16000, "mono", "fltp")
        pcm = np.concatenate([fr.audio_data for fr in frames], axis=1)
        out = rs.convert(pcm)
        n = out.shape[1]
        out = rs.convert(None)
        n += out.shape[1] if out is not None else 0
        return n

    # duration of the clip in seconds (48k samples per frame of 1024)
    t0 = time.monotonic()
    nsamp = one_pass()
    first_s = time.monotonic() - t0
    dur = nsamp / 16000.0
    reps = max(1, int(MIN_MEASURE_S / max(first_s, 1e-3) / 2))
    med, spread, _ = _measure_loop(
        lambda: [one_pass() for _ in range(reps)], reps,
        min_s=MIN_MEASURE_S, max_windows=3)
    x_rt = med * dur
    pin = _pinned("aac_frontend_xrt")
    return {
        "x_realtime": round(x_rt, 1),
        "clip_s": round(dur, 1),
        "cpu_pinned_x_realtime": pin,
        "vs_cpu": round(x_rt / pin, 2) if pin else 0.0,
        "spread": round(spread, 3),
        "comparison": "AAC-LC 48k stereo decode + polyphase resample "
                      "to 16k mono, x-realtime vs pinned cpu "
                      "(ffmpeg -ar 16000 -ac 1) on the same file",
    }


# -- filter-graph dataloader (BASELINE row 4) -------------------------------

def dataloader_row():
    """scale+crop+normalize clip sampling: batched device graph over
    synthetic 256x256 clips, clips/sec (clip = 8 frames)."""
    import jax
    import jax.numpy as jnp

    B, T, S = 16, 8, 256                  # clips/batch, frames, size
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (B * T, S, S), np.uint8)
    u = rng.integers(0, 256, (B * T, S // 2, S // 2), np.uint8)
    v = rng.integers(0, 256, (B * T, S // 2, S // 2), np.uint8)

    from ffmpeg_tpu.scale.swscale import Scaler
    sc = Scaler(src_w=S, src_h=S, src_fmt="yuv420p",
                dst_w=224, dst_h=224, dst_fmt="rgb24")

    @jax.jit
    def graph(yy, uu, vv):
        r, g, b = sc.run([yy, uu, vv])
        x = jnp.stack([r, g, b], -1).astype(jnp.float32)
        x = x[:, 12:212, 12:212, :]       # crop 200x200
        x = (x / 255.0 - 0.45) / 0.225    # normalize
        # full-tensor reduction so XLA cannot dead-code-eliminate the
        # crop/normalize work for any pixel
        return jnp.sum(x, dtype=jnp.float32)

    def one():
        out = graph(y, u, v)
        float(out)                        # force h2d+compute+fetch

    med, spread, _ = _measure_loop(one, B, min_s=MIN_MEASURE_S,
                                   max_windows=12)
    pin = _pinned("dataloader_cps")
    return {
        "clips_per_s": round(med, 1),
        "cpu_pinned_clips_per_s": pin,
        "vs_cpu": round(med / pin, 2) if pin else 0.0,
        "spread": round(spread, 3),
        "comparison": "scale 256->224 + crop 200 + normalize over "
                      "8-frame clips (h2d incl) vs pinned cpu ffmpeg "
                      "filter graph (scale,crop) on rawvideo",
    }


def all_rows(budget_s=None):
    """Run the rows cheapest-first under a wall-clock budget so the
    driver's bench capture can never be starved by the secondary
    rows (the recon rows pay a ~3 min host-parse fixed cost each)."""
    import os
    if budget_s is None:
        budget_s = float(os.environ.get("BENCH_SECONDARY_BUDGET_S",
                                        "600"))
    rows = {}
    t0 = time.monotonic()
    for name, fn in (("dataloader", dataloader_row),
                     ("audio_frontend", audio_frontend_row),
                     ("encode_hotloop_1080p", encode_hotloop_row),
                     ("vp9_full_decode_1080p", recon_row_vp9),
                     ("hevc_recon_1080p", recon_row_hevc)):
        spent = time.monotonic() - t0
        if spent > budget_s:
            rows[name] = {"skipped": f"budget ({spent:.0f}s spent)"}
            continue
        try:
            rows[name] = fn()
        except Exception as exc:          # noqa: BLE001 — record only
            rows[name] = {"error": f"{type(exc).__name__}: {exc}"}
    return rows
