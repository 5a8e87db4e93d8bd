"""Flagship pipeline & parallel infrastructure tests: decode-scale output
quality gate (the bench path), host pipeline scheduler, mesh sharding."""

import ctypes
import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.models.mjpeg_pipeline import (DecodeScaleSpec, build_decode_scale,
                                              example_args, pack_coeffs)
from ffmpeg_tpu.parallel.pipeline import Pipeline, batched
from ffmpeg_tpu.parallel.mesh import make_mesh, shard_batch


def test_pipeline_scheduler_order_and_flow():
    def work(x):
        return x * 2

    out = list(Pipeline(range(100), [work, lambda x: x + 1]).run())
    assert out == [i * 2 + 1 for i in range(100)]


def test_pipeline_error_propagates():
    def boom(x):
        if x == 5:
            raise ValueError("boom")
        return x

    with pytest.raises(ValueError):
        list(Pipeline(range(10), [boom]).run())


def test_batched():
    assert list(batched(range(7), 3)) == [[0, 1, 2], [3, 4, 5], [6]]


def test_mesh_sharding():
    import jax
    mesh = make_mesh(8, spatial=2)
    assert mesh.shape == {"data": 4, "spatial": 2}
    x = np.zeros((8, 16, 16), np.float32)
    (xs,) = shard_batch(mesh, [x])
    assert xs.shape == x.shape


def test_graft_entry_compiles():
    import importlib.util
    import jax
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[0] == args[0].shape[0]
    m.dryrun_multichip(8)


@requires_ref
def test_decode_scale_quality_vs_reference_full_path():
    """The bench configuration (DCT-domain lowres=2, 12 coeffs) must stay
    within a visually-transparent tolerance of the reference's full
    1080p decode+scale path (FATE stddev-style gate)."""
    w, h, out = 640, 360, 224   # smaller than bench for test speed
    jpg = refutil.run(["-f", "lavfi", "-i", f"testsrc2=size={w}x{h}:rate=25",
                       "-frames:v", "1", "-pix_fmt", "yuvj420p", "-q:v", "5",
                       "-c:v", "mjpeg", "-f", "mjpeg", "-"])
    ref_raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "mjpeg", "-i", "-",
         "-vf", f"scale={out}:{out}:flags=bicubic+accurate_rnd+full_chroma_int+full_chroma_inp",
         "-pix_fmt", "rgb24", "-f", "rawvideo", "-"],
        input=jpg, check=True, capture_output=True).stdout
    ref = Frame.from_bytes(ref_raw, "rgb24", out, out)

    from ffmpeg_tpu.codecs.mjpeg import _parse_until_scan, _JpegState
    from ffmpeg_tpu import native
    lib = native.get()
    spec = DecodeScaleSpec.auto(w, h, out, out)
    assert spec.lowres == 1      # 360p -> 224 cannot use DCT downscale
    assert DecodeScaleSpec.auto(1920, 1080, 224, 224).lowres == 2
    fn = build_decode_scale(spec)
    ly, lx = spec.luma_blocks
    cy, cx = spec.chroma_blocks
    L = spec.ncoeff
    st = _JpegState()
    off, _ = _parse_until_scan(jpg, st)
    outs = []
    specs = []
    for comp in st.components:
        bw = lx if comp.h == 2 else cx
        bh = ly if comp.v == 2 else cy
        specs.append((comp.dc_tab, comp.ac_tab, comp.h, comp.v, bw))
        outs.append(np.zeros((bh * bw, L), np.int16))
    sa = (ctypes.c_int * (5 * len(specs)))(*[v for s in specs for v in s])
    op = (ctypes.POINTER(ctypes.c_int16) * len(outs))(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)) for o in outs])
    scan = jpg[off:]
    ret = lib.mjpeg_decode_scan(
        scan, len(scan), st.dc_counts.tobytes(), st.dc_values.tobytes(),
        st.ac_counts.tobytes(), st.ac_values.tobytes(),
        sa, len(specs), lx // 2, ly // 2, st.restart_interval, L, op)
    assert ret == 0
    qy = st.qtabs[st.components[0].q_idx].astype(np.int32)
    qc = st.qtabs[st.components[1].q_idx].astype(np.int32)
    res = fn(pack_coeffs(outs[0].reshape(1, ly, lx, L)),
             pack_coeffs(outs[1].reshape(1, cy, cx, L)),
             pack_coeffs(outs[2].reshape(1, cy, cx, L)), qy, qc)
    for i in range(3):
        p = refutil.psnr(np.asarray(res[i][0]), np.asarray(ref.planes[i]))
        assert p > 45, f"comp {i}: decode-scale quality {p:.1f} dB too low"


def test_scheduler_dts_choke():
    """Multi-output DTS-choke (ffmpeg_sched.c:1446-1497): a slow sink
    bounds how far the fast one may run ahead, so queues stay bounded
    and both outputs still receive every packet in order."""
    import time
    from ffmpeg_tpu.parallel.pipeline import Scheduler

    class P:
        def __init__(self, dts):
            self.dts = dts

    got_fast, got_slow = [], []
    skew_high = []

    def fast(p):
        got_fast.append(p.dts)
        skew_high.append(p.dts - (got_slow[-1] if got_slow else -1))

    def slow(p):
        time.sleep(0.002)
        got_slow.append(p.dts)

    sch = Scheduler(tolerance=16, queue_size=4)
    sch.add_output("fast", fast)
    sch.add_output("slow", slow)
    sch.run((P(i) for i in range(300)), dts_of=lambda p: p.dts)
    assert got_fast == list(range(300))
    assert got_slow == list(range(300))
    # the fast output never ran ahead more than tolerance + queues
    assert max(skew_high) <= 16 + 2 * 4 + 1
    assert sch.max_queued <= 4


def test_scheduler_error_propagates():
    from ffmpeg_tpu.parallel.pipeline import Scheduler

    class P:
        def __init__(self, dts):
            self.dts = dts

    def bad(p):
        if p.dts == 5:
            raise RuntimeError("sink exploded")

    sch = Scheduler(tolerance=4, queue_size=2)
    sch.add_output("bad", bad)
    import pytest
    with pytest.raises(RuntimeError, match="sink exploded"):
        sch.run((P(i) for i in range(50)), dts_of=lambda p: p.dts)
