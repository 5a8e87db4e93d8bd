"""VVC MTT (binary/ternary split) I-slice tests: crafted streams with
random QT+BT+TT trees and rectangular CUs, decoded by the reference
binary and our VvcDecoder, byte-exact (reference vvc/ctu.c:526
can_split, cabac.c:1118 split flags, intra_utils.c:197 wide-angle).

Crafting keeps min CB 8 (log2_min_cb=3) so the 4:2:0 local-dual-tree
mode-type condition (ctu.c:2239) can never trigger — the one VVC
partitioning rule the decoder deliberately rejects (NotSupported)."""

import numpy as np
import pytest

from conftest import requires_ref
from test_vvc import _decode_vs_ref, requires_vvc_ref

from ffmpeg_tpu.codecs.vvc.craft import craft_frame
from ffmpeg_tpu.codecs.vvc.ctu import Plan


class MttPlan(Plan):
    """Random split trees over the full allowed set; fixed or random
    intra modes; dense residuals."""

    def __init__(self, rng, stop_p=0.35, mode=None, chroma=None,
                 cbf_p=0.7, **kw):
        super().__init__(rng, cbf_p=cbf_p, **kw)
        self.stop_p = stop_p
        self._mode = mode
        self._chroma = chroma

    def split_mode(self, x0, y0, log2w, log2h, allowed, forced):
        opts = [o for o in allowed if o != "none"]
        if forced:
            return "qt" if "qt" in allowed else opts[0]
        if not opts or self.rng.random() < self.stop_p:
            return "none"
        return str(self.rng.choice(opts))

    def luma_mode(self, x0, y0, log2):
        if self._mode is not None:
            return self._mode
        return super().luma_mode(x0, y0, log2)

    def chroma_mode(self, x0, y0, log2):
        if self._chroma is not None:
            return self._chroma
        return int(self.rng.integers(5))

    def cbf(self, x0, y0, log2, c):
        return self.rng.random() < self.cbf_p


def _mtt_stream(plan, w, h, depth=3, **kw):
    return craft_frame(plan, w, h, log2_min_cb=3, log2_min_qt=3,
                       mtt_depth_intra=depth, **kw)


@requires_ref
@requires_vvc_ref
@pytest.mark.parametrize("seed", range(6))
def test_vvc_mtt_random_tree(tmp_path, seed):
    plan = MttPlan(np.random.default_rng(seed))
    _decode_vs_ref(_mtt_stream(plan, 64, 64), tmp_path, 64, 64)


@requires_ref
@requires_vvc_ref
@pytest.mark.parametrize("mode", [0, 1, 2, 10, 18, 26, 34, 44, 50,
                                  58, 66])
def test_vvc_mtt_rect_modes(tmp_path, mode):
    """Rectangular CUs hit the wide-angle remap for angular modes."""
    plan = MttPlan(np.random.default_rng(mode), stop_p=0.25,
                   mode=mode, chroma=4, cbf_p=0.5)
    _decode_vs_ref(_mtt_stream(plan, 64, 32), tmp_path, 64, 32)


@requires_ref
@requires_vvc_ref
def test_vvc_mtt_border(tmp_path):
    """Non-CTU-multiple dims: implicit border splits interact with
    the BT/TT allowed-split rules (ctu.c:596-609)."""
    plan = MttPlan(np.random.default_rng(7), stop_p=0.4)
    _decode_vs_ref(_mtt_stream(plan, 48, 40), tmp_path, 48, 40)


@requires_ref
@requires_vvc_ref
def test_vvc_mtt_10bit(tmp_path):
    plan = MttPlan(np.random.default_rng(11), amp=40)
    _decode_vs_ref(_mtt_stream(plan, 64, 64, bit_depth=10),
                   tmp_path, 64, 64, bit_depth=10)


@requires_ref
@requires_vvc_ref
def test_vvc_mtt_deep(tmp_path):
    """Max MTT depth with small max BT/TT sizes exercises the
    size-based allowed-split constraints and their ctx increments."""
    plan = MttPlan(np.random.default_rng(13), stop_p=0.2)
    _decode_vs_ref(_mtt_stream(plan, 64, 64, depth=4,
                               log2_max_bt=4, log2_max_tt=4),
                   tmp_path, 64, 64)
