#!/usr/bin/env python
"""Extract the SMPTE VC-3 (DNxHD/DNxHR) constant tables (DC/AC/run VLC
codes, weight matrices) for the DNxHR coding IDs from the reference tree
into ffmpeg_tpu/codecs/dnxhd_tables.py. Standard-defined constants
(SMPTE ST 2019-1 Annex tables), machine-extracted.

Run: python tools/gen_dnxhd_tables.py
"""

import re
from pathlib import Path

SRC = Path("/root/reference/libavcodec/dnxhddata.c")
DST = Path(__file__).resolve().parent.parent / "ffmpeg_tpu" / "codecs" / \
    "dnxhd_tables.py"


def arr(text, name):
    m = re.search(rf"(?<![A-Za-z0-9_]){re.escape(name)}\[[\w\[\]* +]*\]*"
                  rf"\s*=\s*\{{(.*?)\n\}};", text, re.S)
    if not m:
        raise SystemExit(f"{name} not found")
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    body = re.sub(r"//.*", "", body)
    body = body.replace("{", " ").replace("}", " ")
    return [int(t.strip(), 0) for t in body.replace("\n", " ").split(",")
            if t.strip()]


def main():
    text = SRC.read_text()
    sets = ["1235", "1237", "1238", "1241"]
    out = ['"""DNxHD/DNxHR (SMPTE VC-3) constant tables for the DNxHR',
           'coding IDs — machine-extracted by tools/gen_dnxhd_tables.py',
           'from the reference tables (dnxhddata.c)."""', "", "# fmt: off"]
    for s in sets:
        for part in ("luma_weight", "chroma_weight", "dc_codes", "dc_bits",
                     "ac_codes", "ac_bits", "ac_info", "run_codes",
                     "run_bits", "run"):
            name = f"dnxhd_{s}_{part}"
            try:
                vals = arr(text, name)
            except SystemExit:
                continue
            out.append(f"T{s}_{part.upper()} = {vals}")
    # DNxHR CID entries: (flags444, index_bits, bit_depth(0=var), eob_index,
    #                     weights-set, dc-set, ac-set, run-set)
    out.append("""
CID_TABLE = {
    1270: dict(is444=True, index_bits=6, bit_depth=0, eob_index=4,
               lw='1235', cw='1235', dc='1235', ac='1235', run='1235'),
    1271: dict(is444=False, index_bits=6, bit_depth=0, eob_index=4,
               lw='1241', cw='1241', dc='1235', ac='1235', run='1235'),
    1272: dict(is444=False, index_bits=4, bit_depth=8, eob_index=4,
               lw='1238', cw='1238', dc='1237', ac='1238',
               run='1235', runsym='1238'),
    1273: dict(is444=False, index_bits=4, bit_depth=8, eob_index=3,
               lw='1237', cw='1237', dc='1237', ac='1237', run='1237'),
    1274: dict(is444=False, index_bits=4, bit_depth=8, eob_index=3,
               lw='1237', cw='1237', dc='1237', ac='1237', run='1237'),
}
""")
    DST.write_text("\n".join(out))
    print(f"wrote {DST}")


if __name__ == "__main__":
    main()
