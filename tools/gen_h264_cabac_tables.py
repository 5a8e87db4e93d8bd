#!/usr/bin/env python
"""Extract the H.264 CABAC constants (ITU-T H.264 Tables 9-44/9-45
rangeTabLPS/transIdxLPS and the 9.3.1.1 context initialization m/n
pairs) from the reference tree into ffmpeg_tpu/codecs/h264/cabac_tables.py.

The reference stores the arithmetic tables in a packed blob
(cabac.c ff_h264_cabac_tables: norm_shift[512], lps_range[512],
mlps_state[256], last_coeff_offset[63]); this script unpacks them back
into the spec's layout. Run: python tools/gen_h264_cabac_tables.py
"""

import re
from pathlib import Path

CABAC = Path("/root/reference/libavcodec/cabac.c")
HCABAC = Path("/root/reference/libavcodec/h264_cabac.c")
DST = Path(__file__).resolve().parent.parent / "ffmpeg_tpu" / "codecs" / \
    "h264" / "cabac_tables.py"


def parse_flat(text: str, name: str) -> list:
    m = re.search(rf"{re.escape(name)}\)?\[[^=]*\]\s*=\s*\{{(.*?)\n\}};",
                  text, re.S)
    if not m:
        raise SystemExit(f"{name} not found")
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    body = re.sub(r"//.*", "", body)
    body = body.replace("{", " ").replace("}", " ")
    return [int(t.strip(), 0) & 0xFF if int(t.strip(), 0) < 0
            else int(t.strip(), 0)
            for t in body.replace("\n", " ").split(",") if t.strip()]


def parse_signed_pairs(text: str, name: str) -> list:
    m = re.search(rf"{re.escape(name)}\[[^=]*\]\s*=\s*\n?\{{(.*?)\n\}};",
                  text, re.S)
    if not m:
        raise SystemExit(f"{name} not found")
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    body = re.sub(r"//.*", "", body)
    body = body.replace("{", " ").replace("}", " ")
    vals = [int(t.strip(), 0)
            for t in body.replace("\n", " ").split(",") if t.strip()]
    assert len(vals) % 2 == 0
    return [(vals[i], vals[i + 1]) for i in range(0, len(vals), 2)]


def main():
    blob = parse_flat(CABAC.read_text(), "ff_h264_cabac_tables")
    assert len(blob) == 512 + 512 + 256 + 63, len(blob)
    lps = blob[512:1024]
    mlps = blob[1024:1280]

    range_tab = [[lps[q * 128 + 2 * s] for q in range(4)]
                 for s in range(64)]
    assert range_tab[0] == [128, 176, 208, 240]
    assert range_tab[63] == [2, 2, 2, 2]

    # packed state s = 2*state + mps; MPS transition at mlps[128+s],
    # LPS (with s ^= -1) at mlps[127-s]
    trans_lps = [mlps[127 - 2 * st] >> 1 for st in range(64)]
    trans_mps = [mlps[128 + 2 * st] >> 1 for st in range(64)]
    assert trans_lps[0] == 0 and mlps[127] & 1 == 1   # state 0 flips MPS
    assert trans_mps[:3] == [1, 2, 3] and trans_mps[62:] == [62, 63]

    text = HCABAC.read_text()
    init_i = parse_signed_pairs(text, "cabac_context_init_I")
    assert len(init_i) == 1024, len(init_i)
    m = re.search(r"cabac_context_init_PB\[3\]\[1024\]\[2\]\s*=\s*\{(.*?)\n\};",
                  text, re.S)
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    body = re.sub(r"//.*", "", body)
    body = body.replace("{", " ").replace("}", " ")
    vals = [int(t.strip(), 0)
            for t in body.replace("\n", " ").split(",") if t.strip()]
    assert len(vals) == 3 * 1024 * 2
    init_pb = []
    for k in range(3):
        base = k * 2048
        init_pb.append([(vals[base + 2 * i], vals[base + 2 * i + 1])
                        for i in range(1024)])

    out = ['"""H.264 CABAC constants — ITU-T H.264 Tables 9-44/9-45 and the',
           '9.3.1.1 context initialization pairs. Machine-extracted by',
           'tools/gen_h264_cabac_tables.py."""', "", "# fmt: off"]
    out.append(f"RANGE_TAB_LPS = {range_tab}")
    out.append(f"TRANS_IDX_LPS = {trans_lps}")
    out.append(f"CONTEXT_INIT_I = {init_i}")
    for k in range(3):
        out.append(f"CONTEXT_INIT_PB_{k} = {init_pb[k]}")
    out.append("CONTEXT_INIT_PB = [CONTEXT_INIT_PB_0, CONTEXT_INIT_PB_1, "
               "CONTEXT_INIT_PB_2]")
    out.append("")
    DST.write_text("\n".join(out))
    print(f"wrote {DST}")


if __name__ == "__main__":
    main()
