#!/usr/bin/env python
"""Extract the ATSC A/52 (AC-3) constant tables — frame sizes (Table
5.18), bit-allocation constants (Tables 7.5-7.13 and the log-add /
hearing-threshold curves), quantizer levels (Table 7.18) — from the
reference tree into ffmpeg_tpu/codecs/ac3_tables.py.

These are standard-defined constants, not creative code; extraction
avoids transcription errors. Run: python tools/gen_ac3_tables.py
"""

import re
from pathlib import Path

AC3TAB = Path("/root/reference/libavcodec/ac3tab.c")
AC3C = Path("/root/reference/libavcodec/ac3.c")
AC3DATA = Path("/root/reference/libavcodec/ac3dec_data.c")
DST = Path(__file__).resolve().parent.parent / "ffmpeg_tpu" / "codecs" / \
    "ac3_tables.py"


def parse_array(text: str, name: str) -> list:
    # single-line / flat arrays first, then brace-nested multiline ones
    m = re.search(rf"{re.escape(name)}\[[0-9A-Za-z_+\[\]]*\]*\s*=\s*"
                  rf"\{{([^{{}};]*?)\}};", text, re.S)
    if not m:
        m = re.search(rf"{re.escape(name)}\[[0-9A-Za-z_+\[\]]*\]*\s*=\s*"
                      rf"\{{(.*?)\n\}};", text, re.S)
    if not m:
        raise SystemExit(f"array {name} not found")
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    body = re.sub(r"//.*", "", body)
    body = body.replace("{", " ").replace("}", " ")
    vals = []
    for tok in body.replace("\n", " ").split(","):
        tok = tok.strip()
        if not tok:
            continue
        vals.append(int(tok, 0))
    return vals


def chunk(vals, n):
    assert len(vals) % n == 0
    return [vals[i:i + n] for i in range(0, len(vals), n)]


def main():
    tab = AC3TAB.read_text()
    core = AC3C.read_text()
    out = ['"""AC-3 (ATSC A/52) constant tables — standard data',
           '(frame sizes 5.18, bit allocation 7.5-7.13, quantizers 7.18).',
           'Machine-extracted by tools/gen_ac3_tables.py from the',
           'reference tables (ac3tab.c, ac3.c:36-160)."""',
           "", "# fmt: off"]

    out.append(f"FRAME_SIZE_TAB = {chunk(parse_array(tab, 'ff_ac3_frame_size_tab'), 3)}")
    out.append(f"CHANNELS_TAB = {parse_array(tab, 'ff_ac3_channels_tab')}")
    out.append(f"SAMPLE_RATE_TAB = {parse_array(tab, 'ff_ac3_sample_rate_tab')[:3]}")
    out.append(f"BITRATE_TAB = {parse_array(tab, 'ff_ac3_bitrate_tab')}")
    out.append(f"REMATRIX_BAND_TAB = {parse_array(tab, 'ff_ac3_rematrix_band_tab')}")
    out.append(f"BAP_TAB = {parse_array(tab, 'ff_ac3_bap_tab')}")
    out.append(f"SLOW_DECAY_TAB = {parse_array(tab, 'ff_ac3_slow_decay_tab')}")
    out.append(f"FAST_DECAY_TAB = {parse_array(tab, 'ff_ac3_fast_decay_tab')}")
    out.append(f"SLOW_GAIN_TAB = {parse_array(tab, 'ff_ac3_slow_gain_tab')}")
    out.append(f"DB_PER_BIT_TAB = {parse_array(tab, 'ff_ac3_db_per_bit_tab')}")
    floor = [v - 65536 if v > 32767 else v
             for v in parse_array(tab, 'ff_ac3_floor_tab')]
    out.append(f"FLOOR_TAB = {floor}")
    out.append(f"FAST_GAIN_TAB = {parse_array(tab, 'ff_ac3_fast_gain_tab')}")

    out.append(f"BAND_START_TAB = {parse_array(core, 'ff_ac3_band_start_tab')}")
    out.append(f"BIN_TO_BAND_TAB = {parse_array(core, 'ff_ac3_bin_to_band_tab')}")
    out.append(f"LOG_ADD_TAB = {parse_array(core, 'ac3_log_add_tab')}")
    out.append(f"HEARING_THRESHOLD_TAB = "
               f"{chunk(parse_array(core, 'ac3_hearing_threshold_tab'), 3)}")

    data = AC3DATA.read_text()
    out.append(f"QUANTIZATION_TAB = {parse_array(data, 'ff_ac3_quantization_tab')}")

    out.append("""

# Formula-derived tables (A/52 sections 7.1.3 / 7.3.5): grouped-value
# ungrouping and symmetric mantissa dequantization to 24-bit scale.
def _symmetric_dequant(code, levels):
    v = (code - (levels >> 1)) * (1 << 24)
    # C integer division truncates toward zero
    return -((-v) // levels) if v < 0 else v // levels


UNGROUP_3_IN_5 = [(i // 9, (i % 9) // 3, i % 3) for i in range(32)]
UNGROUP_3_IN_7 = [(i // 25, (i % 25) // 5, i % 5) for i in range(128)]

BAP1_MANTISSAS = [[_symmetric_dequant(c, 3) for c in UNGROUP_3_IN_5[i]]
                  for i in range(32)]
BAP2_MANTISSAS = [[_symmetric_dequant(c, 5) for c in UNGROUP_3_IN_7[i]]
                  for i in range(128)]
BAP3_MANTISSAS = [_symmetric_dequant(c, 7) for c in range(7)] + [0]
BAP4_MANTISSAS = [[_symmetric_dequant(i // 11, 11),
                   _symmetric_dequant(i % 11, 11)] for i in range(128)]
BAP5_MANTISSAS = [_symmetric_dequant(c, 15) for c in range(15)] + [0]

# Dynamic range gain (A/52 7.7.1): 2^exp * mantissa
DYNAMIC_RANGE_TAB = [
    2.0 ** ((i >> 5) - ((i >> 7) << 3) - 5) * ((i & 0x1F) | 0x20)
    for i in range(256)]
""")
    DST.write_text("\n".join(out))
    print(f"wrote {DST}")


if __name__ == "__main__":
    main()
