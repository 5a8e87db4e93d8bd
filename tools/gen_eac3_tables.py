#!/usr/bin/env python
"""Extract the E-AC-3 (ETSI TS 102 366 Annex E) constant tables — GAQ
remap factors (E3.6), VQ mantissa codebooks, frame exponent strategy
LUT (E2.14), default band structures (E2.15/E2.16), hebap mapping —
from the reference tree (eac3_data.c, ac3dec_data.c, ac3tab.c/h) into
ffmpeg_tpu/codecs/eac3_tables.py. Standard-defined constants only."""

import re
from pathlib import Path

LAC = Path("/root/reference/libavcodec")
DST = Path(__file__).resolve().parent.parent / "ffmpeg_tpu" / "codecs" \
    / "eac3_tables.py"


def parse_array(text, name):
    m = re.search(rf"{re.escape(name)}\s*\[[^=]*=\s*\{{([^{{}};]*?)\}};",
                  text, re.S)
    if not m:
        m = re.search(rf"{re.escape(name)}\s*\[[^=]*=\s*\{{(.*?)\n\}};",
                      text, re.S)
    assert m, name
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    body = re.sub(r"//.*", "", body)
    body = body.replace("{", " ").replace("}", " ")
    # exponent strategy constants (ac3defs.h): REUSE=0 D15=1 D25=2 D45=3
    names = {"EXP_REUSE": "0", "EXP_D15": "1", "EXP_D25": "2",
             "EXP_D45": "3"}
    for k, v in names.items():
        body = body.replace(k, v)
    return [int(t, 0) for t in body.replace("\n", " ").split(",")
            if t.strip()]


def chunk(vals, n):
    assert len(vals) % n == 0, (len(vals), n)
    return [vals[i:i + n] for i in range(0, len(vals), n)]


def main():
    eac3 = (LAC / "eac3_data.c").read_text()
    decd = (LAC / "ac3dec_data.c").read_text()
    tab = (LAC / "ac3tab.c").read_text()
    tabh = (LAC / "ac3tab.h").read_text()

    out = ['"""E-AC-3 constant tables (ETSI TS 102 366 Annex E) —',
           'machine-extracted by tools/gen_eac3_tables.py from the',
           'reference transcriptions (eac3_data.c, ac3dec_data.c,',
           'ac3tab.c). Do not edit."""', "", "import numpy as np", "",
           "# fmt: off"]

    out.append(f"BITS_VS_HEBAP = {parse_array(eac3, 'ff_eac3_bits_vs_hebap')}")
    out.append(f"GAQ_REMAP_1 = {parse_array(eac3, 'ff_eac3_gaq_remap_1')}")
    out.append(f"GAQ_REMAP_2_4_A = "
               f"{chunk(parse_array(eac3, 'ff_eac3_gaq_remap_2_4_a'), 2)}")
    out.append(f"GAQ_REMAP_2_4_B = "
               f"{chunk(parse_array(eac3, 'ff_eac3_gaq_remap_2_4_b'), 2)}")
    for hebap, size in ((1, 4), (2, 8), (3, 16), (4, 32), (5, 128),
                        (6, 256), (7, 512)):
        v = chunk(parse_array(eac3, f"vq_hebap{hebap}"), 6)
        # C zero-fills rows omitted from the initializer (vq_hebap4
        # declares [32][6] with 31 rows)
        v += [[0] * 6] * (size - len(v))
        assert len(v) == size
        out.append(f"VQ_HEBAP{hebap} = np.array({v}, np.int32)")
    out.append("MANTISSA_VQ = [None, VQ_HEBAP1, VQ_HEBAP2, VQ_HEBAP3,"
               " VQ_HEBAP4, VQ_HEBAP5, VQ_HEBAP6, VQ_HEBAP7]")
    out.append(f"FRM_EXPSTR = "
               f"{chunk(parse_array(eac3, 'ff_eac3_frm_expstr'), 6)}")
    out.append(f"HEBAP_TAB = {parse_array(decd, 'ff_eac3_hebap_tab')}")
    out.append(f"DEFAULT_SPX_BAND_STRUCT = "
               f"{parse_array(decd, 'ff_eac3_default_spx_band_struct')}")
    out.append(f"DEFAULT_CPL_BAND_STRUCT = "
               f"{parse_array(tab, 'ff_eac3_default_cpl_band_struct')}")

    # decoded-channel → output-channel order (ff_ac3_dec_channel_map:
    # COMMON_CHANNEL_MAP macro in ac3tab.h + the 2F2R/3F2R rows)
    m = re.search(r"#define COMMON_CHANNEL_MAP\s*\\\n(.*?)\n\n", tabh,
                  re.S)
    assert m
    m2 = re.search(r"ff_ac3_dec_channel_map\[8\]\[2\]\[6\] = \{\s*"
                   r"COMMON_CHANNEL_MAP\n(.*?)\};", tab, re.S)
    assert m2
    rows = []
    for line in (m.group(1) + "\n" + m2.group(1)).splitlines():
        pairs = re.findall(r"\{\s*((?:\d+\s*,?\s*)*)\}", line)
        if len(pairs) == 2:
            rows.append([[int(x) for x in p.replace(",", " ").split()]
                         for p in pairs])
    assert len(rows) == 8, len(rows)
    out.append(f"DEC_CHANNEL_MAP = {rows}")

    out.append("""
# Table E.25 spectral extension attenuation (formula from the
# reference comment: atten[code][bin] = 2^((bin+1)*(code+1)/-15))
SPX_ATTEN_TAB = np.array(
    [[2.0 ** ((b + 1) * (c + 1) / -15.0) for b in range(3)]
     for c in range(32)], np.float32)

# number of audio blocks per frame (numblkscod)
EAC3_BLOCKS = [1, 2, 3, 6]
""")
    DST.write_text("\n".join(out) + "\n")
    print(f"wrote {DST}")


if __name__ == "__main__":
    main()
