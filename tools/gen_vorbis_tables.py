#!/usr/bin/env python
"""Extract the Vorbis floor1 inverse dB table (Vorbis I spec 10.1 — a
spec-defined constant table) from its transcription in the reference at
libavcodec/vorbis_data.c:2117 into ffmpeg_tpu/codecs/vorbis_tables.py."""

import re
from pathlib import Path

text = Path("/root/reference/libavcodec/vorbis_data.c").read_text()
m = re.search(r"ff_vorbis_floor1_inverse_db_table\[256\]=\{(.*?)\};",
              text, re.S)
vals = re.findall(r"([0-9]+\.[0-9]*(?:[eE][-+]?[0-9]+)?)[Ff]",
                  m.group(1))
assert len(vals) == 256
vals = [v if v[-1].isdigit() else v + "0" for v in vals]
lines = ["'''Vorbis floor1 inverse dB table (Vorbis I spec 10.1;",
         "transcribed from libavcodec/vorbis_data.c by",
         "tools/gen_vorbis_tables.py). Do not edit.'''", "",
         "import numpy as np", "", "INVERSE_DB_TABLE = np.array(["]
for i in range(0, 256, 3):
    lines.append("    " + ", ".join(vals[i:i + 3]) + ",")
lines.append("], np.float32)")
Path("ffmpeg_tpu/codecs/vorbis_tables.py").write_text(
    "\n".join(lines) + "\n")
print("wrote ffmpeg_tpu/codecs/vorbis_tables.py")
