#!/usr/bin/env python
"""Extract the ISO/IEC 14496-3 AAC constant tables (spectrum/scalefactor
Huffman codebooks, scalefactor band offsets, TNS band limits) from the
reference tree's aactab.c into ffmpeg_tpu/codecs/aac_tables.py.

These are standard-defined constants (ISO 14496-3 Tables 4.A.2-4.A.12 and
4.129-4.140), not creative code; we extract rather than retype them to
avoid transcription errors. Run: python tools/gen_aac_tables.py
"""

import re
import sys
from pathlib import Path

SRC = Path("/root/reference/libavcodec/aactab.c")
DST = Path(__file__).resolve().parent.parent / "ffmpeg_tpu" / "codecs" / "aac_tables.py"


def parse_array(text: str, name: str) -> list:
    m = re.search(rf"{re.escape(name)}\[\]?[0-9\[\]]*\s*=\s*\{{(.*?)\}};",
                  text, re.S)
    if not m:
        raise SystemExit(f"array {name} not found")
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    body = re.sub(r"//.*", "", body)
    vals = []
    for tok in body.replace("\n", " ").split(","):
        tok = tok.strip()
        if not tok:
            continue
        vals.append(int(tok, 0))
    return vals


def main():
    text = SRC.read_text()
    out = ['"""AAC constant tables — ISO/IEC 14496-3 standard data',
           '(Huffman codebooks Tables 4.A.2-4.A.12, scalefactor band offsets',
           'Tables 4.129-4.140, TNS limits). Machine-extracted from the',
           'reference tables by tools/gen_aac_tables.py."""',
           "", "# fmt: off"]

    # spectral codebooks 1..11
    for i in range(1, 12):
        codes = parse_array(text, f"codes{i}")
        bits = parse_array(text, f"bits{i}")
        out.append(f"SPECTRAL_CODES_{i} = {codes}")
        out.append(f"SPECTRAL_BITS_{i} = {bits}")
    out.append("SPECTRAL_CODES = [" +
               ", ".join(f"SPECTRAL_CODES_{i}" for i in range(1, 12)) + "]")
    out.append("SPECTRAL_BITS = [" +
               ", ".join(f"SPECTRAL_BITS_{i}" for i in range(1, 12)) + "]")

    out.append(f"SCALEFACTOR_CODES = {parse_array(text, 'ff_aac_scalefactor_code')}")
    out.append(f"SCALEFACTOR_BITS = {parse_array(text, 'ff_aac_scalefactor_bits')}")

    out.append(f"NUM_SWB_1024 = {parse_array(text, 'ff_aac_num_swb_1024')}")
    out.append(f"NUM_SWB_128 = {parse_array(text, 'ff_aac_num_swb_128')}")

    # swb offset tables for 1024/128 per samplerate family
    for n in ("1024", "128"):
        # pointer table gives the mapping order
        m = re.search(rf"ff_swb_offset_{n}\[\]\s*=\s*\{{(.*?)\}};", text, re.S)
        body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
        ptrs = [p.strip() for p in body.replace("\n", " ").split(",") if p.strip()]
        arrays = {}
        for p in set(ptrs):
            arrays[p] = parse_array(text, p)
        out.append(f"# per-samplerate-index swb offsets (window size {n})")
        seen = []
        for p in ptrs:
            seen.append(arrays[p])
        out.append(f"SWB_OFFSET_{n} = {seen}")

    out.append(f"TNS_MAX_BANDS_1024 = {parse_array(text, 'ff_tns_max_bands_1024')}")
    out.append(f"TNS_MAX_BANDS_128 = {parse_array(text, 'ff_tns_max_bands_128')}")
    out.append("# fmt: on")
    DST.write_text("\n".join(out) + "\n")
    print(f"wrote {DST} ({DST.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
