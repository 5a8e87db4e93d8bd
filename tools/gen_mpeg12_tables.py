#!/usr/bin/env python
"""Extract ISO/IEC 11172-2 / 13818-2 (MPEG-1/2 video) constant tables from
the reference's mpeg12data.c into ffmpeg_tpu/codecs/mpeg12_tables.py.
Standard-defined VLC codebooks and matrices (spec Annex B tables), machine-
extracted to avoid transcription errors."""

import re
from pathlib import Path

SRC = Path("/root/reference/libavcodec/mpeg12data.c")
DST = Path(__file__).resolve().parent.parent / "ffmpeg_tpu" / "codecs" / "mpeg12_tables.py"


def parse(text, name, pairs=False):
    m = re.search(rf"{re.escape(name)}\[[^=]*=\s*\{{(.*?)\n\}};", text, re.S)
    if not m:
        raise SystemExit(f"{name} not found")
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    body = re.sub(r"//.*", "", body)
    if pairs:
        out = []
        for pm in re.finditer(r"\{\s*([0-9xa-fA-F]+)\s*,\s*([0-9xa-fA-F]+)\s*\}", body):
            out.append((int(pm.group(1), 0), int(pm.group(2), 0)))
        return out
    vals = []
    for tok in body.replace("\n", " ").split(","):
        tok = tok.strip()
        if tok:
            vals.append(int(tok, 0))
    return vals


def main():
    text = SRC.read_text()
    out = ['"""MPEG-1/2 video constant tables (ISO 11172-2 / 13818-2 Annex B',
           'VLC codebooks, default quant matrices, frame rates). Machine-',
           'extracted by tools/gen_mpeg12_tables.py."""', "", "# fmt: off"]
    out.append(f"DEFAULT_INTRA_MATRIX = {parse(text, 'ff_mpeg1_default_intra_matrix')[:64]}")
    out.append(f"DEFAULT_NON_INTRA_MATRIX = {parse(text, 'ff_mpeg1_default_non_intra_matrix')}")
    out.append(f"DC_LUM_CODE = {parse(text, 'ff_mpeg12_vlc_dc_lum_code')}")
    out.append(f"DC_LUM_BITS = {parse(text, 'ff_mpeg12_vlc_dc_lum_bits')}")
    out.append(f"DC_CHROMA_CODE = {parse(text, 'ff_mpeg12_vlc_dc_chroma_code')}")
    out.append(f"DC_CHROMA_BITS = {parse(text, 'ff_mpeg12_vlc_dc_chroma_bits')}")
    out.append(f"MPEG1_VLC = {parse(text, 'ff_mpeg1_vlc_table', pairs=True)}")
    out.append(f"MPEG2_VLC = {parse(text, 'ff_mpeg2_vlc_table', pairs=True)}")
    out.append(f"RL_LEVEL = {parse(text, 'ff_mpeg12_level')}")
    out.append(f"RL_RUN = {parse(text, 'ff_mpeg12_run')}")
    out.append(f"MB_ADDR_INC = {parse(text, 'ff_mpeg12_mbAddrIncrTable', pairs=True)}")
    out.append(f"MB_PAT = {parse(text, 'ff_mpeg12_mbPatTable', pairs=True)}")
    out.append(f"MB_MV = {parse(text, 'ff_mpeg12_mbMotionVectorTable', pairs=True)}")
    fr = re.search(r"ff_mpeg2_frame_rate_tab\[\]\s*=\s*\{(.*?)\n\};", text, re.S).group(1)
    rates = re.findall(r"\{\s*(-?\d+)\s*,\s*(-?\d+)\s*\}", fr)
    out.append(f"FRAME_RATES = {[(int(a), int(b)) for a, b in rates]}")
    out.append("# fmt: on")
    DST.write_text("\n".join(out) + "\n")
    print("wrote", DST, DST.stat().st_size, "bytes")


if __name__ == "__main__":
    main()
