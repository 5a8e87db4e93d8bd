#!/usr/bin/env python
"""Extract the IMA/Microsoft ADPCM spec tables (step table, index
table, MS adaptation/coefficients — IMA ADPCM spec 1992, MS WAVE
spec) from the reference's transcription in libavcodec/adpcm_data.c
into ffmpeg_tpu/codecs/adpcm_tables.py."""

import re
from pathlib import Path

SRC = Path("/root/reference/libavcodec/adpcm_data.c")
DST = Path(__file__).resolve().parent.parent / "ffmpeg_tpu" / \
    "codecs" / "adpcm_tables.py"


def arr(text, name):
    m = re.search(rf"const [a-z0-9_]+ {re.escape(name)}\s*\[\d*\]\s*=\s*\{{(.*?)\}};",
                  text, re.S)
    assert m, name
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    return [int(t, 0) for t in body.replace("\n", " ").split(",")
            if t.strip()]


def main():
    t = SRC.read_text()
    out = ['"""IMA / Microsoft ADPCM spec constants, extracted by',
           'tools/gen_adpcm_tables.py from adpcm_data.c. Do not',
           'edit."""', "", "# fmt: off"]
    out.append(f"STEP_TABLE = {arr(t, 'ff_adpcm_step_table')}")
    out.append(f"INDEX_TABLE = {arr(t, 'ff_adpcm_index_table')}")
    out.append(f"ADAPTATION_TABLE = "
               f"{arr(t, 'ff_adpcm_AdaptationTable')}")
    out.append(f"ADAPT_COEFF1 = {arr(t, 'ff_adpcm_AdaptCoeff1')}")
    out.append(f"ADAPT_COEFF2 = {arr(t, 'ff_adpcm_AdaptCoeff2')}")
    out.append(f"YAMAHA_DIFFLOOKUP = "
               f"{arr(t, 'ff_adpcm_yamaha_difflookup')}")
    DST.write_text("\n".join(out) + "\n")
    print(f"wrote {DST}")


if __name__ == "__main__":
    main()
