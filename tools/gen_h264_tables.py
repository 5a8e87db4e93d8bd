#!/usr/bin/env python
"""Extract the ITU-T H.264 (ISO 14496-10) CAVLC code tables (Tables 9-5
coeff_token, 9-7/9-8 total_zeros, 9-10 run_before) from the reference
tree into ffmpeg_tpu/codecs/h264/tables.py. Standard-defined constants,
machine-extracted to avoid transcription errors.

Run: python tools/gen_h264_tables.py
"""

import re
from pathlib import Path

SRC = Path("/root/reference/libavcodec/h264_cavlc.c")
DST = Path(__file__).resolve().parent.parent / "ffmpeg_tpu" / "codecs" / \
    "h264" / "tables.py"


def parse_array(text: str, name: str) -> list:
    m = re.search(
        rf"(?<![A-Za-z0-9_]){re.escape(name)}\[[\w\[\]* +]*\]*\s*=\s*"
        rf"\{{(.*?)\n\}};", text, re.S)
    if not m:
        raise SystemExit(f"array {name} not found")
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    body = re.sub(r"//.*", "", body)
    body = body.replace("{", " ").replace("}", " ")
    return [int(t.strip(), 0) for t in body.replace("\n", " ").split(",")
            if t.strip()]


def chunk(vals, n):
    assert len(vals) % n == 0, (len(vals), n)
    return [vals[i:i + n] for i in range(0, len(vals), n)]


def parse_rows(text: str, name: str) -> list:
    """2D array with possibly ragged rows → list of row lists."""
    m = re.search(
        rf"(?<![A-Za-z0-9_]){re.escape(name)}\[[\w\[\]* +]*\]*\s*=\s*"
        rf"\{{(.*?)\n\}};", text, re.S)
    if not m:
        raise SystemExit(f"array {name} not found")
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    body = re.sub(r"//.*", "", body)
    rows = []
    for rm in re.finditer(r"\{([^{}]*)\}", body):
        rows.append([int(t.strip(), 0) for t in rm.group(1).split(",")
                     if t.strip()])
    return rows


def main():
    text = SRC.read_text()
    out = ['"""H.264 CAVLC code tables — ITU-T H.264 Tables 9-5..9-10,',
           'machine-extracted by tools/gen_h264_tables.py from the',
           'reference tables (h264_cavlc.c:47-236)."""',
           "", "# fmt: off"]
    out.append("COEFF_TOKEN_LEN = "
               f"{parse_rows(text, 'coeff_token_len')}")
    out.append("COEFF_TOKEN_BITS = "
               f"{parse_rows(text, 'coeff_token_bits')}")
    out.append("CHROMA_DC_COEFF_TOKEN_LEN = "
               f"{parse_array(text, 'chroma_dc_coeff_token_len')}")
    out.append("CHROMA_DC_COEFF_TOKEN_BITS = "
               f"{parse_array(text, 'chroma_dc_coeff_token_bits')}")
    out.append("TOTAL_ZEROS_LEN = "
               f"{parse_rows(text, 'total_zeros_len')}")
    out.append("TOTAL_ZEROS_BITS = "
               f"{parse_rows(text, 'total_zeros_bits')}")
    out.append("CHROMA_DC_TOTAL_ZEROS_LEN = "
               f"{parse_rows(text, 'chroma_dc_total_zeros_len')}")
    out.append("CHROMA_DC_TOTAL_ZEROS_BITS = "
               f"{parse_rows(text, 'chroma_dc_total_zeros_bits')}")
    out.append(f"RUN_LEN = {parse_rows(text, 'run_len')}")
    out.append(f"RUN_BITS = {parse_rows(text, 'run_bits')}")
    out.append("")
    DST.parent.mkdir(exist_ok=True)
    DST.write_text("\n".join(out))
    print(f"wrote {DST}")


if __name__ == "__main__":
    main()


def extend():
    text2 = Path("/root/reference/libavcodec/h264data.c").read_text()
    out = ["", "# from h264data.c (ITU-T H.264 Tables 9-4, 8-15)"]
    out.append("GOLOMB_TO_INTRA4X4_CBP = "
               f"{parse_array(text2, 'ff_h264_golomb_to_intra4x4_cbp')}")
    out.append("GOLOMB_TO_INTER_CBP = "
               f"{parse_array(text2, 'ff_h264_golomb_to_inter_cbp')}")
    # ITU-T H.264 Table 8-15 (8-bit): identity below QP 30
    qpc = list(range(30)) + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36,
                             36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39]
    out.append(f"CHROMA_QP_8BIT = {qpc}")
    out.append("")
    with open(DST, "a") as f:
        f.write("\n".join(out))
    print("extended")


extend()


def extend2():
    text3 = Path("/root/reference/libavcodec/h264_loopfilter.c").read_text()
    out = ["", "# loop filter thresholds (ITU-T H.264 Table 8-16),"
           " index biased by 52"]
    out.append(f"ALPHA_TABLE = {parse_array(text3, 'alpha_table')}")
    out.append(f"BETA_TABLE = {parse_array(text3, 'beta_table')}")
    out.append(f"TC0_TABLE = {parse_rows(text3, 'tc0_table')}")
    out.append("")
    with open(DST, "a") as f:
        f.write("\n".join(out))
    print("extended2")


extend2()
