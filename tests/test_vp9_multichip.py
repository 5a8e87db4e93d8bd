"""VP9 tile-across-chips (SURVEY §5, P3/P8): tile columns decoded as
independent entropy/recon shards, with the in-loop deblocker running
on the device mesh — single-device lax kernel (lf_tpu) and the
column-sharded pipelined wavefront with ppermute halo exchange
(lf_sharded) — all bit-exact vs the reference decoder."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

import jax
from jax.sharding import Mesh

from test_vp9 import Plan, craft_frame, wrap_ivf

import ffmpeg_tpu.codecs.vp9 as V
from ffmpeg_tpu.codecs.vp9 import tile_bounds
from ffmpeg_tpu.codecs.vp9.block import FrameState, TileWalker
from ffmpeg_tpu.codecs.vp9.bool import BoolDecoder
from ffmpeg_tpu.codecs.vp9.header import (parse_compressed,
                                          parse_uncompressed)
from ffmpeg_tpu.codecs.vp9.lf_sharded import loopfilter_sharded
from ffmpeg_tpu.codecs.vp9.lf_tpu import loopfilter_frame_tpu

W4, H4 = 1024, 64                         # 4 tile columns


def _craft_tiled(seed, lvl=36, sharp=1):
    rng = np.random.default_rng(seed)
    return craft_frame(Plan(rng, split_p=0.25, maxn=6, amp=80),
                       width=W4, height=H4, tile_cols_log2=2,
                       filter_level=lvl, sharpness=sharp)


def _ref_planes(stream, tmp_path):
    p = tmp_path / "s.ivf"
    p.write_bytes(wrap_ivf([stream], W4, H4))
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(p),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    y = np.frombuffer(raw[:W4 * H4], np.uint8).reshape(H4, W4)
    return y


def _swap_lf(fn):
    class _Ctx:
        def __enter__(self):
            self.orig = V.loopfilter_frame
            V.loopfilter_frame = fn
        def __exit__(self, *a):
            V.loopfilter_frame = self.orig
    return _Ctx()


@requires_ref
@pytest.mark.parametrize("lvl,sharp", [(24, 0), (48, 3)])
def test_vp9_lf_device_kernel(tmp_path, lvl, sharp):
    """Single-device lax loop filter == host filter == reference."""
    stream = _craft_tiled(5, lvl, sharp)
    h, fs_host = V.decode_frame(stream)
    with _swap_lf(loopfilter_frame_tpu):
        h2, fs_dev = V.decode_frame(stream)
    np.testing.assert_array_equal(fs_host.y, fs_dev.y)
    np.testing.assert_array_equal(fs_host.u, fs_dev.u)
    np.testing.assert_array_equal(fs_host.v, fs_dev.v)
    ref_y = _ref_planes(stream, tmp_path)
    np.testing.assert_array_equal(fs_dev.y[:H4, :W4], ref_y)


@requires_ref
@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_vp9_lf_sharded_mesh(tmp_path, n_dev):
    """Column-sharded pipelined deblock over an n-device mesh with
    ppermute halo exchange: bit-exact vs host and reference."""
    stream = _craft_tiled(37)
    h, fs_host = V.decode_frame(stream)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("spatial",))
    with _swap_lf(lambda fs: loopfilter_sharded(fs, mesh)):
        h2, fs_sh = V.decode_frame(stream)
    np.testing.assert_array_equal(fs_host.y, fs_sh.y)
    np.testing.assert_array_equal(fs_host.u, fs_sh.u)
    np.testing.assert_array_equal(fs_host.v, fs_sh.v)
    ref_y = _ref_planes(stream, tmp_path)
    np.testing.assert_array_equal(fs_sh.y[:H4, :W4], ref_y)


@requires_ref
def test_vp9_tile_parallel_decode(tmp_path):
    """The full tile-across-chips flow: the 4 tile columns are
    entropy-decoded and reconstructed independently per shard (each
    owns a disjoint bitstream slice, column range and left-ctx), then
    the deblocker runs column-sharded over a 4-device mesh — the
    decode-side layout of vp9.c:1996 mapped onto a jax 'spatial'
    axis. Bit-exact vs the reference decoder."""
    stream = _craft_tiled(61)
    h = parse_uncompressed(stream)
    pos = (h.uncompressed_bits + 7) // 8
    probs = parse_compressed(h, stream[pos:pos + h.compressed_size])
    pos += h.compressed_size
    fs = FrameState(h, probs)
    tiles = []
    for tc in range(4):
        if tc != 3:
            size = int.from_bytes(stream[pos:pos + 4], "big")
            pos += 4
        else:
            size = len(stream) - pos
        tiles.append(stream[pos:pos + size])
        pos += size
    # per-shard decode: each tile column end-to-end, any order
    for tc in (2, 0, 3, 1):
        c0, c1 = tile_bounds(tc, 2, fs.sb_cols)
        core = BoolDecoder(tiles[tc])
        assert not core.get(128)
        wk = TileWalker(fs, core, tile_col_start=c0, tile_col_end=c1)
        for row in range(0, fs.rows, 8):
            fs.new_tile_left()
            for col in range(c0, min(c1, fs.cols), 8):
                wk.decode_sb(row, col, 0)
    mesh = Mesh(np.array(jax.devices()[:4]), ("spatial",))
    loopfilter_sharded(fs, mesh)
    ref_y = _ref_planes(stream, tmp_path)
    np.testing.assert_array_equal(fs.y[:H4, :W4], ref_y)
