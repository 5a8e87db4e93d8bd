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

SILK_ARRAYS = [
    ("ff_silk_model_lbrr_flags_40", "SILK_MODEL_LBRR_FLAGS_40", (5,)),
    ("ff_silk_model_lbrr_flags_60", "SILK_MODEL_LBRR_FLAGS_60", (9,)),
    ("ff_silk_model_stereo_s1", "SILK_MODEL_STEREO_S1", (26,)),
    ("ff_silk_model_stereo_s2", "SILK_MODEL_STEREO_S2", (4,)),
    ("ff_silk_model_stereo_s3", "SILK_MODEL_STEREO_S3", (6,)),
    ("ff_silk_model_mid_only", "SILK_MODEL_MID_ONLY", (3,)),
    ("ff_silk_model_frame_type_inactive",
     "SILK_MODEL_FRAME_TYPE_INACTIVE", (3,)),
    ("ff_silk_model_frame_type_active",
     "SILK_MODEL_FRAME_TYPE_ACTIVE", (5,)),
    ("ff_silk_model_gain_highbits", "SILK_MODEL_GAIN_HIGHBITS",
     (3, 9)),
    ("ff_silk_model_gain_lowbits", "SILK_MODEL_GAIN_LOWBITS", (9,)),
    ("ff_silk_model_gain_delta", "SILK_MODEL_GAIN_DELTA", (42,)),
    ("ff_silk_model_lsf_s1", "SILK_MODEL_LSF_S1", (2, 2, 33)),
    ("ff_silk_model_lsf_s2", "SILK_MODEL_LSF_S2", (32, 10)),
    ("ff_silk_model_lsf_s2_ext", "SILK_MODEL_LSF_S2_EXT", (8,)),
    ("ff_silk_model_lsf_interpolation_offset",
     "SILK_MODEL_LSF_INTERPOLATION_OFFSET", (6,)),
    ("ff_silk_model_pitch_highbits", "SILK_MODEL_PITCH_HIGHBITS",
     (33,)),
    ("ff_silk_model_pitch_lowbits_mb",
     "SILK_MODEL_PITCH_LOWBITS_MB", (7,)),
    ("ff_silk_model_pitch_delta", "SILK_MODEL_PITCH_DELTA", (22,)),
    ("ff_silk_model_pitch_contour_nb10ms",
     "SILK_MODEL_PITCH_CONTOUR_NB10MS", (4,)),
    ("ff_silk_model_pitch_contour_nb20ms",
     "SILK_MODEL_PITCH_CONTOUR_NB20MS", (12,)),
    ("ff_silk_model_pitch_contour_mbwb10ms",
     "SILK_MODEL_PITCH_CONTOUR_MBWB10MS", (13,)),
    ("ff_silk_model_pitch_contour_mbwb20ms",
     "SILK_MODEL_PITCH_CONTOUR_MBWB20MS", (35,)),
    ("ff_silk_model_ltp_filter", "SILK_MODEL_LTP_FILTER", (4,)),
    ("ff_silk_model_ltp_filter0_sel", "SILK_MODEL_LTP_FILTER0_SEL",
     (9,)),
    ("ff_silk_model_ltp_filter1_sel", "SILK_MODEL_LTP_FILTER1_SEL",
     (17,)),
    ("ff_silk_model_ltp_filter2_sel", "SILK_MODEL_LTP_FILTER2_SEL",
     (33,)),
    ("ff_silk_model_ltp_scale_index", "SILK_MODEL_LTP_SCALE_INDEX",
     (4,)),
    ("ff_silk_model_lcg_seed", "SILK_MODEL_LCG_SEED", (5,)),
    ("ff_silk_model_exc_rate", "SILK_MODEL_EXC_RATE", (2, 10)),
    ("ff_silk_model_pulse_count", "SILK_MODEL_PULSE_COUNT",
     (11, 19)),
    ("ff_silk_model_pulse_location", "SILK_MODEL_PULSE_LOCATION",
     (4, 168)),
    ("ff_silk_model_excitation_lsb", "SILK_MODEL_EXCITATION_LSB",
     (3,)),
    ("ff_silk_model_excitation_sign", "SILK_MODEL_EXCITATION_SIGN",
     (3, 2, 7, 3)),
    ("ff_silk_stereo_weights", "SILK_STEREO_WEIGHTS", (16,)),
    ("ff_silk_lsf_s2_model_sel_nbmb", "SILK_LSF_S2_MODEL_SEL_NBMB",
     (32, 10)),
    ("ff_silk_lsf_s2_model_sel_wb", "SILK_LSF_S2_MODEL_SEL_WB",
     (32, 16)),
    ("ff_silk_lsf_pred_weights_nbmb", "SILK_LSF_PRED_WEIGHTS_NBMB",
     (2, 9)),
    ("ff_silk_lsf_pred_weights_wb", "SILK_LSF_PRED_WEIGHTS_WB",
     (2, 15)),
    ("ff_silk_lsf_weight_sel_nbmb", "SILK_LSF_WEIGHT_SEL_NBMB",
     (32, 9)),
    ("ff_silk_lsf_weight_sel_wb", "SILK_LSF_WEIGHT_SEL_WB",
     (32, 15)),
    ("ff_silk_lsf_codebook_nbmb", "SILK_LSF_CODEBOOK_NBMB",
     (32, 10)),
    ("ff_silk_lsf_codebook_wb", "SILK_LSF_CODEBOOK_WB", (32, 16)),
    ("ff_silk_lsf_min_spacing_nbmb", "SILK_LSF_MIN_SPACING_NBMB",
     (11,)),
    ("ff_silk_lsf_min_spacing_wb", "SILK_LSF_MIN_SPACING_WB",
     (17,)),
    ("ff_silk_lsf_ordering_nbmb", "SILK_LSF_ORDERING_NBMB", (10,)),
    ("ff_silk_lsf_ordering_wb", "SILK_LSF_ORDERING_WB", (16,)),
    ("ff_silk_cosine", "SILK_COSINE", (129,)),
    ("ff_silk_pitch_scale", "SILK_PITCH_SCALE", (3,)),
    ("ff_silk_pitch_min_lag", "SILK_PITCH_MIN_LAG", (3,)),
    ("ff_silk_pitch_max_lag", "SILK_PITCH_MAX_LAG", (3,)),
    ("ff_silk_pitch_offset_nb10ms", "SILK_PITCH_OFFSET_NB10MS",
     (3, 2)),
    ("ff_silk_pitch_offset_nb20ms", "SILK_PITCH_OFFSET_NB20MS",
     (11, 4)),
    ("ff_silk_pitch_offset_mbwb10ms", "SILK_PITCH_OFFSET_MBWB10MS",
     (12, 2)),
    ("ff_silk_pitch_offset_mbwb20ms", "SILK_PITCH_OFFSET_MBWB20MS",
     (34, 4)),
    ("ff_silk_ltp_filter0_taps", "SILK_LTP_FILTER0_TAPS", (8, 5)),
    ("ff_silk_ltp_filter1_taps", "SILK_LTP_FILTER1_TAPS", (16, 5)),
    ("ff_silk_ltp_filter2_taps", "SILK_LTP_FILTER2_TAPS", (32, 5)),
    ("ff_silk_model_lsf_weight_nbmb", "SILK_MODEL_LSF_WEIGHT_NBMB",
     (32, 10)),
    ("ff_silk_model_lsf_weight_wb", "SILK_MODEL_LSF_WEIGHT_WB",
     (32, 16)),
    ("ff_silk_ltp_scale_factor", "SILK_LTP_SCALE_FACTOR", (3,)),
    ("ff_silk_shell_blocks", "SILK_SHELL_BLOCKS", (3, 2)),
    ("ff_silk_quant_offset", "SILK_QUANT_OFFSET", (2, 2)),
    ("ff_silk_stereo_interp_len", "SILK_STEREO_INTERP_LEN", (3,)),
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

    # SILK tables (all integer; CDF models keep the leading total)
    for cname, pyname, shape in SILK_ARRAYS:
        body = body_of(cname, TAB)
        vals = [int(v, 0) for v in re.findall(
            r"-?0[xX][0-9a-fA-F]+|-?\d+", body)]
        total = 1
        for d in shape:
            total *= d
        # C partial initialization (e.g. lsf_s2[32][10] with 16 rows
        # written): remaining entries are zero
        assert len(vals) <= total, (cname, len(vals), total)
        vals += [0] * (total - len(vals))
        out.append(f"{pyname} = np.array({vals}, "
                   f"np.int64).reshape{tuple(shape)}")
    out.append("SILK_MODEL_PITCH_LOWBITS_NB = SILK_MODEL_LCG_SEED")
    out.append("SILK_MODEL_PITCH_LOWBITS_WB = SILK_MODEL_GAIN_LOWBITS")
    dst = Path(__file__).resolve().parents[1] / "ffmpeg_tpu" / \
        "codecs" / "opus" / "tables_gen.py"
    dst.parent.mkdir(exist_ok=True)
    dst.write_text("\n".join(out) + "\n")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
