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


def main():
    assert bench.ensure_clip(), "no reference build to craft clips"
    out = {}
    detail = {}
    for key, clip, lowres in (("full_rst", bench.CLIP_RST, False),
                              ("full", bench.CLIP, False),
                              ("lowres1", bench.CLIP, True)):
        best, runs = measure(clip, lowres)
        out[key] = best
        detail[key + "_runs"] = runs
        print(f"{key}: best-of-{N} = {best:.1f} f/s  (runs: {runs})")
    out["pinned_with"] = f"tools/pin_cpu_baseline.py best-of-{N}"
    out.update(detail)
    bench.BASELINE_CACHE.parent.mkdir(parents=True, exist_ok=True)
    bench.BASELINE_CACHE.write_text(json.dumps(out, indent=1))
    print(f"pinned -> {bench.BASELINE_CACHE}")


if __name__ == "__main__":
    main()
