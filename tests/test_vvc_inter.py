"""VVC inter (P/B slice) decoder tests: crafted low-delay GOPs (our
CABAC encoder driving the walker in encode mode) decoded by both the
reference binary and our VvcDecoder, byte-exact.

Covers: cu_skip/merge/AMVP/intra CU modes, HMVP, merge candidate
pruning, pairwise + zero-fill candidates, bi-prediction with the VVC
8-tap 1/16-pel luma + 4-tap 1/32-pel chroma filters, multiple
reference pictures (ref_idx TR coding), large MVDs (limited EG1),
MTT rectangular inter CUs, 10-bit, and mixed P/B GOPs (reference
vvc/ctu.c:1795 inter_data, vvc/mvs.c merge/AMVP, vvc/inter.c MC)."""

import numpy as np
import pytest

from conftest import requires_ref
from test_vvc import _decode_vs_ref_frames, requires_vvc_ref

from ffmpeg_tpu.codecs.vvc.craft import craft_gop
from ffmpeg_tpu.codecs.vvc.ctu import Plan


class InterPlan(Plan):
    """Random inter intents over the full allowed toolset."""

    def __init__(self, rng, modes=("skip", "merge", "amvp", "intra"),
                 stop_p=1.0, mvd_amp=8, max_merge=6, **kw):
        super().__init__(rng, **kw)
        self.modes = modes
        self.stop_p = stop_p
        self.mvd_amp = mvd_amp
        self.max_merge = max_merge

    def split_mode(self, x0, y0, log2w, log2h, allowed, forced):
        opts = [o for o in allowed if o != "none"]
        if forced:
            return "qt" if "qt" in allowed else opts[0]
        if not opts or self.rng.random() < self.stop_p:
            return "none"
        return str(self.rng.choice(opts))

    def cu_mode(self, x0, y0, log2w, log2h):
        return str(self.rng.choice(self.modes))

    def merge_index(self, x0, y0, max_cand):
        return int(self.rng.integers(0, min(max_cand,
                                            self.max_merge)))

    def amvp_choice(self, x0, y0, is_b, w, h, nact):
        pred = str(self.rng.choice(["l0", "l1", "bi"] if is_b
                                   else ["l0"]))
        a = self.mvd_amp
        return {"pred": pred,
                "ref_idx": [int(self.rng.integers(0, max(1, nact[i])))
                            for i in range(2)],
                "mvd": [(int(self.rng.integers(-a, a + 1)),
                         int(self.rng.integers(-a, a + 1)))
                        for _ in range(2)],
                "mvp": [int(self.rng.integers(0, 2))
                        for _ in range(2)]}

    def cu_coded(self, x0, y0):
        return bool(self.rng.integers(0, 2))

    def cbf(self, x0, y0, log2, c):
        return bool(self.rng.integers(0, 2))


def _gop(seed, kinds, w, h, plan_kw=None, **kw):
    rng = np.random.default_rng(seed)
    pk = plan_kw or {}
    frames = [(k, InterPlan(rng, **pk)) for k in kinds]
    return craft_gop(frames, w, h, log2_min_cb=3, log2_min_qt=3, **kw)


@requires_ref
@requires_vvc_ref
@pytest.mark.parametrize("seed", range(4))
def test_vvc_inter_ipbb(tmp_path, seed):
    s = _gop(seed, "IPBB", 64, 64, nrefs=(2, 1))
    _decode_vs_ref_frames(s, tmp_path, 64, 64, 4)


@requires_ref
@requires_vvc_ref
def test_vvc_inter_p_only(tmp_path):
    """P slices: L0-only AMVP, skip/merge runs, HMVP across 5
    frames."""
    s = _gop(10, "IPPPP", 96, 64, nrefs=(2, 1))
    _decode_vs_ref_frames(s, tmp_path, 96, 64, 5)


@requires_ref
@requires_vvc_ref
def test_vvc_inter_b_lowdelay(tmp_path):
    """Low-delay B: bi-prediction averaging, both lists backwards."""
    s = _gop(11, "IBBBB", 64, 64, nrefs=(2, 2))
    _decode_vs_ref_frames(s, tmp_path, 64, 64, 5)


@requires_ref
@requires_vvc_ref
def test_vvc_inter_multi_ref(tmp_path):
    """4 L0 refs exercise the ref_idx TR context+bypass split and
    AMVP cross-list POC matching."""
    s = _gop(12, "IPPPPPPP", 64, 64, nrefs=(4, 1))
    _decode_vs_ref_frames(s, tmp_path, 64, 64, 8)


@requires_ref
@requires_vvc_ref
def test_vvc_inter_big_mvd(tmp_path):
    """|mvd| up to 700 quarter-pels: limited-EG1 escape path and
    far out-of-frame MC edge replication."""
    s = _gop(13, "IPPP", 64, 64,
             plan_kw={"mvd_amp": 700, "modes": ("amvp",)},
             nrefs=(2, 1))
    _decode_vs_ref_frames(s, tmp_path, 64, 64, 4)


@requires_ref
@requires_vvc_ref
def test_vvc_inter_mtt(tmp_path):
    """Rectangular inter CUs from BT/TT splits, P+B mix."""
    s = _gop(14, "IPBPBB", 64, 64, plan_kw={"stop_p": 0.4},
             mtt_depth_inter=2, mtt_depth_intra=2, nrefs=(2, 2))
    _decode_vs_ref_frames(s, tmp_path, 64, 64, 6)


@requires_ref
@requires_vvc_ref
def test_vvc_inter_mtt_border(tmp_path):
    """Non-CTU-multiple dims + MTT + inter."""
    s = _gop(15, "IPBB", 48, 40, plan_kw={"stop_p": 0.5},
             mtt_depth_inter=2, mtt_depth_intra=2, nrefs=(2, 2))
    _decode_vs_ref_frames(s, tmp_path, 48, 40, 4)


@requires_ref
@requires_vvc_ref
def test_vvc_inter_merge2(tmp_path):
    """max_num_merge_cand=2: zero-fill + pairwise candidates are hit
    constantly; merge_idx has no bypass tail."""
    s = _gop(16, "IBBB", 64, 64, plan_kw={"max_merge": 2},
             max_num_merge_cand=2, nrefs=(2, 2))
    _decode_vs_ref_frames(s, tmp_path, 64, 64, 4)


@requires_ref
@requires_vvc_ref
def test_vvc_inter_skip_merge_only(tmp_path):
    """Pure motion-copy frames (no residual syntax on skip)."""
    s = _gop(17, "IPPPP", 96, 64,
             plan_kw={"modes": ("skip", "merge")}, nrefs=(2, 1))
    _decode_vs_ref_frames(s, tmp_path, 96, 64, 5)


@requires_ref
@requires_vvc_ref
def test_vvc_inter_10bit(tmp_path):
    s = _gop(18, "IPBB", 64, 64, plan_kw={"amp": 40},
             bit_depth=10, nrefs=(2, 2))
    _decode_vs_ref_frames(s, tmp_path, 64, 64, 4, bit_depth=10)


@requires_ref
@requires_vvc_ref
def test_vvc_inter_deep_mix(tmp_path):
    """Long mixed GOP, deep MTT, 5 merge cands: the all-in stream."""
    s = _gop(19, "IPBPBBPB", 96, 64, plan_kw={"stop_p": 0.35},
             mtt_depth_inter=3, mtt_depth_intra=3, nrefs=(2, 2),
             max_num_merge_cand=5)
    _decode_vs_ref_frames(s, tmp_path, 96, 64, 8)


def test_vvc_inter_executor_matches_serial():
    """threads>1 defers inter+intra CU recon to the P4 executor
    wavefront; output must equal the serial path."""
    from ffmpeg_tpu.codecs import CodecContext
    from ffmpeg_tpu.core.packet import Packet
    from ffmpeg_tpu.io.stream import CodecParameters, MediaType
    s = _gop(20, "IPBB", 96, 64, plan_kw={"stop_p": 0.5},
             mtt_depth_inter=2, mtt_depth_intra=2, nrefs=(2, 2))
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="vvc")
    f1 = CodecContext.open_decoder(par).decode_all(
        [Packet(data=s, pts=0)])
    f2 = CodecContext.open_decoder(par, options={"threads": 4}) \
        .decode_all([Packet(data=s, pts=0)])
    assert len(f1) == len(f2) == 4
    for a, b in zip(f1, f2):
        for pa, pb in zip(a.planes, b.planes):
            np.testing.assert_array_equal(np.asarray(pa),
                                          np.asarray(pb))


def test_vvc_inter_roundtrip_no_ref():
    """Oracle-less gate: crafted P/B GOP decodes deterministically
    through our own decoder."""
    import zlib
    from ffmpeg_tpu.codecs import CodecContext
    from ffmpeg_tpu.core.packet import Packet
    from ffmpeg_tpu.io.stream import CodecParameters, MediaType
    s = _gop(21, "IPBB", 64, 64, nrefs=(2, 2))
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="vvc")
    crcs = []
    for _ in range(2):
        fr = CodecContext.open_decoder(par).decode_all(
            [Packet(data=s, pts=0)])
        assert len(fr) == 4
        assert fr[0].key_frame and not fr[1].key_frame
        crcs.append(zlib.crc32(b"".join(
            np.asarray(p).tobytes() for f in fr for p in f.planes)))
    assert crcs[0] == crcs[1]
