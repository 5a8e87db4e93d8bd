"""tonemap filter tests: every algorithm x desaturation setting
bit-matches the reference on linear float RGB input."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.core.frame import Frame
from ffmpeg_tpu.filters import get_filter
from ffmpeg_tpu.filters.video5 import determine_signal_peak

W, H = 64, 32


def _ref_has_tonemap():
    if not refutil.REF.exists():
        return False
    out = subprocess.run([str(refutil.REF), "-v", "0", "-filters"],
                         capture_output=True).stdout
    return b" tonemap " in out


def _hdr_planes(seed=0):
    rng = np.random.default_rng(seed)
    rgb = (rng.random((3, H, W)).astype(np.float32) ** 2) * 20.0
    return rgb[1], rgb[2], rgb[0]          # g, b, r plane order


@requires_ref
@pytest.mark.skipif(not _ref_has_tonemap(),
                    reason="reference lacks tonemap")
@pytest.mark.parametrize("mode", ["hable", "reinhard", "mobius",
                                  "linear", "gamma", "clip", "none"])
@pytest.mark.parametrize("desat", ["0", "2.0"])
def test_tonemap_vs_reference(tmp_path, mode, desat):
    g, b, r = _hdr_planes()
    raw = tmp_path / "in.raw"
    raw.write_bytes(g.tobytes() + b.tobytes() + r.tobytes())
    out = tmp_path / "out.raw"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-y", "-f", "rawvideo",
         "-pix_fmt", "gbrpf32le", "-s", f"{W}x{H}", "-i", str(raw),
         "-vf", f"tonemap={mode}:peak=20:desat={desat}",
         "-f", "rawvideo", str(out)], check=True)
    want = np.frombuffer(out.read_bytes(), np.float32) \
        .reshape(3, H, W)
    f = get_filter("tonemap")(f"{mode}:peak=20:desat={desat}")
    got = f.process(Frame.video(W, H, "gbrpf32le",
                                planes=[g, b, r]))[0]
    got = np.stack([np.asarray(p) for p in got.planes])
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_tonemap_output_in_range():
    g, b, r = _hdr_planes(3)
    f = get_filter("tonemap")("hable:peak=20")
    out = f.process(Frame.video(W, H, "gbrpf32le",
                                planes=[g, b, r]))[0]
    m = max(float(np.asarray(p).max()) for p in out.planes)
    # hable is not a hard limiter (no clip in the reference either):
    # slight overshoot is expected
    assert m <= 1.15


def test_signal_peak_from_side_data():
    fr = Frame.video(4, 4, "gbrpf32le",
                     planes=[np.zeros((4, 4), np.float32)] * 3)
    fr.side_data["content_light_level"] = {"max_cll": 4000}
    assert determine_signal_peak(fr) == 40.0
    fr.side_data.clear()
    fr.side_data["mastering_display_metadata"] = \
        {"max_luminance": 1000}
    assert determine_signal_peak(fr) == 10.0
    fr.side_data.clear()
    fr.color_trc = "smpte2084"
    assert determine_signal_peak(fr) == 100.0
    fr.color_trc = "arib-std-b67"
    assert determine_signal_peak(fr) == 12.0
