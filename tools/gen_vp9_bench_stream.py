#!/usr/bin/env python
"""Generate the committed VP9 1080p bench stream (tests/data/bench/
vp9_1080p_100.ivf): 1 keyframe + N-1 inter frames crafted with the
test-suite walker (encode direction), then cross-checked byte-exact
against the reference decoder. Density knobs are tuned so 100 frames
fit in ~5 MB while still carrying real coefficient + MV work per frame
(VERDICT r4 item 10: >=100-frame streams, not 3).

Usage: python tools/gen_vp9_bench_stream.py [n_frames] [out.ivf]
"""

import struct
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np  # noqa: E402


def ivf_wrap(frames, width, height, rate=25):
    hdr = bytearray(b"DKIF")
    hdr += struct.pack("<HH", 0, 32)
    hdr += b"VP90"
    hdr += struct.pack("<HHIIII", width, height, rate, 1,
                       len(frames), 0)
    assert len(hdr) == 32
    buf = bytearray(hdr)
    for i, f in enumerate(frames):
        buf += struct.pack("<IQ", len(f), i)
        buf += f
    return bytes(buf)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else \
        REPO / "tests" / "data" / "bench" / "vp9_1080p_100.ivf"
    import test_vp9 as K
    import test_vp9_inter as I
    rng = np.random.default_rng(0)
    W, H = 1920, 1080
    s = I.CraftSession(width=W, height=H)
    t0 = time.monotonic()
    s.key(K.Plan(rng, split_p=0.03, skip_p=0.75, maxn=3, amp=30))
    for i in range(n - 1):
        s.inter(I.InterPlan(rng, inter_p=0.97, newmv_p=0.25,
                            mv_amp=40, comp_p=0.1 if i % 3 == 0 else 0,
                            skip_p=0.8, split_p=0.03, maxn=2, amp=24),
                signbias=(0, 0, 1) if i % 3 == 0 else (0, 0, 0))
        if (i + 1) % 10 == 0:
            kb = sum(len(f) for f in s.frames) / 1024
            print(f"{i + 2}/{n} frames, {kb:.0f} KB, "
                  f"{time.monotonic() - t0:.0f}s", flush=True)
    data = ivf_wrap(s.frames, W, H)
    out.write_bytes(data)
    print(f"wrote {out} ({len(data) / 1e6:.2f} MB, {n} frames)")


if __name__ == "__main__":
    main()
