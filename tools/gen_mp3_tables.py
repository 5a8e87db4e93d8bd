#!/usr/bin/env python
"""Extract the ISO/IEC 11172-3 MPEG audio Layer III constant tables
(spectral Huffman code lengths/symbols, count1 quad codes, scalefactor
band sizes, slen/pretab tables, the synthesis analysis window) from the
reference tree into ffmpeg_tpu/codecs/mp3_tables.py.

These are standard-defined constants (ISO 11172-3 Tables B.7/B.8 and
Annex B 3-B.3), not creative code; extraction avoids transcription
errors. Run: python tools/gen_mp3_tables.py
"""

import re
from pathlib import Path

COMMON = Path("/root/reference/libavcodec/mpegaudiodec_common.c")
DSPDATA = Path("/root/reference/libavcodec/mpegaudiodsp_data.c")
DST = Path(__file__).resolve().parent.parent / "ffmpeg_tpu" / "codecs" / "mp3_tables.py"


def parse_array(text: str, name: str) -> list:
    m = re.search(rf"{re.escape(name)}\[[0-9\[\]]*\]*\s*=\s*\{{(.*?)\n\}};",
                  text, re.S)
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
    text = COMMON.read_text()
    out = ['"""MPEG-1/2 audio Layer III constant tables — ISO/IEC 11172-3',
           'standard data (Huffman tables B.7, scalefactor bands Annex B,',
           'synthesis window Table C.1). Machine-extracted by',
           'tools/gen_mp3_tables.py from the reference tables',
           '(mpegaudiodec_common.c:73-400, mpegaudiodsp_data.c:22)."""',
           "", "# fmt: off"]

    sizes = parse_array(text, "mpa_huff_sizes_minus_one")
    lens = parse_array(text, "mpa_hufflens")
    syms = parse_array(text, "mpa_huffsymbols")
    out.append(f"HUFF_SIZES = {[s + 1 for s in sizes]}")
    out.append(f"HUFF_LENS = {lens}")
    out.append(f"HUFF_SYMBOLS = {syms}")

    hd = parse_array(text, "ff_mpa_huff_data")
    out.append(f"HUFF_DATA = {chunk(hd, 2)}  # table select -> (vlc, linbits)")

    qc = parse_array(text, "mpa_quad_codes")
    qb = parse_array(text, "mpa_quad_bits")
    out.append(f"QUAD_CODES = {chunk(qc, 16)}")
    out.append(f"QUAD_BITS = {chunk(qb, 16)}")

    out.append(f"BAND_SIZE_LONG = {chunk(parse_array(text, 'ff_band_size_long'), 22)}")
    out.append(f"BAND_SIZE_SHORT = {chunk(parse_array(text, 'ff_band_size_short'), 13)}")
    out.append(f"SLEN_TABLE = {chunk(parse_array(text, 'ff_slen_table'), 16)}")
    lsf = parse_array(text, "ff_lsf_nsf_table")
    out.append(f"LSF_NSF_TABLE = {[chunk(c, 4) for c in chunk(lsf, 12)]}")
    out.append(f"PRETAB = {chunk(parse_array(text, 'ff_mpa_pretab'), 22)[1]}")

    dsp = DSPDATA.read_text()
    out.append(f"ENWINDOW = {parse_array(dsp, 'ff_mpa_enwindow')}")
    out.append("")
    DST.write_text("\n".join(out))
    print(f"wrote {DST}")


if __name__ == "__main__":
    main()


def extend_l2():
    src = Path("/root/reference/libavcodec/mpegaudiodata.c")
    text = src.read_text()
    out = ["", "# Layer I/II allocation tables (ISO 11172-3 Tables B.2)"]
    out.append(f"QUANT_STEPS = {parse_array(text, 'ff_mpa_quant_steps')}")
    out.append(f"QUANT_BITS = {parse_array(text, 'ff_mpa_quant_bits')}")
    for n in (1, 3, 4):
        out.append(f"ALLOC_TABLE_{n} = "
                   f"{parse_array(text, f'alloc_table_{n}')}")
    out.append("ALLOC_TABLES = [ALLOC_TABLE_1, ALLOC_TABLE_1, "
               "ALLOC_TABLE_3, ALLOC_TABLE_3, ALLOC_TABLE_4]")
    out.append("SBLIMITS = [27, 30, 8, 12, 30]")
    out.append("")
    with open(DST, "a") as f:
        f.write("\n".join(out))
    print("extended_l2")


extend_l2()
