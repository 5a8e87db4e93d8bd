#!/usr/bin/env python
"""Extract the Opus CELT constant tables (RFC 6716 — spec-defined
constants) from their transcription in the reference at
libavcodec/opus/tab.c into ffmpeg_tpu/codecs/opus/tables_gen.py."""

import re
from pathlib import Path

TAB = Path("/root/reference/libavcodec/opus/tab.c").read_text()
DUR = Path("/root/reference/libavcodec/opus/"
           "frame_duration_tab.c").read_text()

INT_ARRAYS = [
    ("ff_celt_band_end", "BAND_END", (5,), TAB),
    ("ff_celt_model_tapset", "MODEL_TAPSET", (4,), TAB),
    ("ff_celt_model_spread", "MODEL_SPREAD", (5,), TAB),
    ("ff_celt_model_alloc_trim", "MODEL_ALLOC_TRIM", (12,), TAB),
    ("ff_celt_freq_bands", "FREQ_BANDS", (22,), TAB),
    ("ff_celt_freq_range", "FREQ_RANGE", (21,), TAB),
    ("ff_celt_log_freq_range", "LOG_FREQ_RANGE", (21,), TAB),
    ("ff_celt_tf_select", "TF_SELECT", (4, 2, 2, 2), TAB),
    ("ff_celt_coarse_energy_dist", "COARSE_ENERGY_DIST",
     (4, 2, 42), TAB),
    ("ff_celt_static_alloc", "STATIC_ALLOC", (11, 21), TAB),
    ("ff_celt_static_caps", "STATIC_CAPS", (4, 2, 21), TAB),
    ("ff_celt_cache_bits", "CACHE_BITS", (392,), TAB),
    ("ff_celt_cache_index", "CACHE_INDEX", (105,), TAB),
    ("ff_celt_log2_frac", "LOG2_FRAC", (24,), TAB),
    ("ff_celt_bit_interleave", "BIT_INTERLEAVE", (16,), TAB),
    ("ff_celt_bit_deinterleave", "BIT_DEINTERLEAVE", (16,), TAB),
    ("ff_celt_hadamard_order", "HADAMARD_ORDER", (46,), TAB),
    ("ff_celt_qn_exp2", "QN_EXP2", (8,), TAB),
    ("celt_pvq_u", "PVQ_U", (1272,), TAB),
    ("ff_opus_frame_duration", "FRAME_DURATION", (32,), DUR),
]

FLOAT_ARRAYS = [
    ("ff_celt_mean_energy", "MEAN_ENERGY", 25, TAB),
    ("ff_celt_postfilter_taps", "POSTFILTER_TAPS", 9, TAB),
    ("ff_celt_window_padded", "WINDOW_PADDED", 136, TAB),
    ("ff_celt_window2", "WINDOW2", 120, TAB),
]


def body_of(name, text):
    m = re.search(rf"{re.escape(name)}(?:\)?)\[[^=]*=\s*\{{(.*?)\}};",
                  text, re.S)
    assert m, name
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    return re.sub(r"//[^\n]*", "", body)


def main():
    out = ["'''Opus CELT constant tables (RFC 6716; transcribed from",
           "libavcodec/opus/tab.c by tools/gen_opus_tables.py).",
           "Do not edit.'''", "", "import numpy as np", ""]
    for cname, pyname, shape, text in INT_ARRAYS:
        body = body_of(cname, text)
        vals = [int(v, 0) for v in re.findall(
            r"-?0[xX][0-9a-fA-F]+|-?\d+", body)]
        total = 1
        for d in shape:
            total *= d
        assert len(vals) == total, (cname, len(vals), total)
        out.append(f"{pyname} = np.array({vals}, "
                   f"np.int64).reshape{tuple(shape)}")
    for cname, pyname, n, text in FLOAT_ARRAYS:
        body = body_of(cname, text)
        vals = re.findall(r"(-?[0-9]+\.[0-9]*(?:[eE][-+]?[0-9]+)?)[Ff]?",
                          body)
        assert len(vals) == n, (cname, len(vals), n)
        out.append(f"{pyname} = np.array([" + ", ".join(vals)
                   + "], np.float64)")
    # alpha/beta coefs are arithmetic expressions: evaluate them
    for cname, pyname in (("ff_celt_alpha_coef", "ALPHA_COEF"),
                          ("ff_celt_beta_coef", "BETA_COEF")):
        body = body_of(cname, TAB).replace("f", "")
        vals = [eval(e.strip(), {"__builtins__": {}})
                for e in body.split(",") if e.strip()]
        assert len(vals) == 4, (cname, len(vals))
        out.append(f"{pyname} = np.array({vals!r}, np.float64)")
    # pvq_u row offsets (pointer table)
    offs = re.findall(r"celt_pvq_u \+\s*(\d+)", TAB)
    assert len(offs) == 15
    out.append("PVQ_U_ROW = [" + ", ".join(offs) + "]")
    out.append("WINDOW = WINDOW_PADDED[8:]")
    out.append("MODEL_ENERGY_SMALL = MODEL_TAPSET")
    dst = Path(__file__).resolve().parents[1] / "ffmpeg_tpu" / \
        "codecs" / "opus" / "tables_gen.py"
    dst.parent.mkdir(exist_ok=True)
    dst.write_text("\n".join(out) + "\n")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
