#!/usr/bin/env python
"""Measure and PIN the CPU reference denominator for bench.py.

Runs the reference ffmpeg decode+scale path best-of-N under as little
competing load as possible and writes tests/data/cpu_baseline.json.
Run manually; bench.py never overwrites the pinned file (r03 verdict:
a per-run denominator swung the headline ratio 4.01x<->2.23x on
identical TPU performance — cf. checkasm's min-cycles discipline,
/root/reference/tests/checkasm/ext/src/checkasm.c:94-234).
"""
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
import bench  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def measure(clip, lowres):
    best = 0.0
    runs = []
    lr = ["-lowres", "1"] if lowres else []
    for _ in range(N):
        t0 = time.monotonic()
        subprocess.run(
            [str(bench.REF), "-v", "error", "-threads", "0", *lr,
             "-f", "mjpeg", "-i", str(clip),
             "-vf", f"scale={bench.OUT}:{bench.OUT}",
             "-pix_fmt", "rgb24", "-benchmark", "-f", "null", "-"],
            check=True, capture_output=True)
        r = bench.NFRAMES / (time.monotonic() - t0)
        runs.append(round(r, 1))
        best = max(best, r)
    return best, runs


def _best_of(cmd, units, n=N):
    best, runs = 0.0, []
    for _ in range(n):
        t0 = time.monotonic()
        subprocess.run(cmd, check=True, capture_output=True)
        r = units / (time.monotonic() - t0)
        runs.append(round(r, 1))
        best = max(best, r)
    return best, runs


def pin_vp9_100(out):
    """CPU full decode of the committed 100-frame VP9 stream."""
    path = REPO / "tests" / "data" / "bench" / "vp9_1080p_100.ivf"
    if not path.exists():
        return
    best, runs = _best_of(
        [str(bench.REF), "-v", "error", "-threads", "0",
         "-i", str(path), "-f", "null", "-"], 100)
    out["vp9_1080p_100"] = best
    out["vp9_1080p_100_runs"] = runs
    print(f"vp9_1080p_100: best-of-{N} = {best:.1f} f/s")


def pin_encode(out):
    """CPU mpeg4 encode MB/s at 1080p (BASELINE row 6 denominator)."""
    frames = 50
    mbs = (1088 // 16) * (1920 // 16)
    best, runs = _best_of(
        [str(bench.REF), "-v", "error", "-f", "lavfi",
         "-i", "testsrc2=size=1920x1080:rate=25",
         "-frames:v", str(frames), "-c:v", "mpeg4", "-q:v", "5",
         "-f", "null", "-"], frames * mbs)
    out["encode_mbps"] = round(best, 0)
    out["encode_mbps_runs"] = runs
    print(f"encode_mbps: best-of-{N} = {best:.0f} MB/s")


def main():
    assert bench.ensure_clip(), "no reference build to craft clips"
    # merge-update: preserve rows pinned by other tools/sessions
    out = {}
    if bench.BASELINE_CACHE.exists():
        out = json.loads(bench.BASELINE_CACHE.read_text())
    detail = {}
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    if which in ("all", "mjpeg"):
        for key, clip, lowres in (("full_rst", bench.CLIP_RST, False),
                                  ("full", bench.CLIP, False),
                                  ("lowres1", bench.CLIP, True)):
            best, runs = measure(clip, lowres)
            out[key] = best
            detail[key + "_runs"] = runs
            print(f"{key}: best-of-{N} = {best:.1f} f/s (runs: {runs})")
    if which in ("all", "vp9"):
        pin_vp9_100(out)
    if which in ("all", "encode"):
        pin_encode(out)
    out["pinned_with"] = f"tools/pin_cpu_baseline.py best-of-{N}"
    out.update(detail)
    bench.BASELINE_CACHE.parent.mkdir(parents=True, exist_ok=True)
    bench.BASELINE_CACHE.write_text(json.dumps(out, indent=1))
    print(f"pinned -> {bench.BASELINE_CACHE}")


if __name__ == "__main__":
    main()
