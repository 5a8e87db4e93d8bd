#!/usr/bin/env python
"""Extract the VVC CABAC context layout + init values (H.266 spec
Tables 51+ constants) from the reference vvc/cabac.c into
ffmpeg_tpu/codecs/vvc/tables.py. Mechanical spec-constant extraction,
like the other gen_* tools."""

import re
from pathlib import Path

REF = Path("/root/reference/libavcodec/vvc/cabac.c")
OUT = Path(__file__).resolve().parent.parent / "ffmpeg_tpu" / \
    "codecs" / "vvc" / "tables.py"


def main():
    src = REF.read_text()

    # --- syntax element offsets from the enum ------------------------
    m = re.search(r"enum SyntaxElement \{(.*?)\n\};", src, re.S)
    body = m.group(1)
    body = re.sub(r"//.*", "", body)
    entries = []
    for part in body.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            name, expr = [x.strip() for x in part.split("=", 1)]
        else:
            name, expr = part, None
        entries.append((name, expr))
    offsets = {}
    order = []
    prev = None
    for name, expr in entries:
        if expr is None:
            val = offsets[prev] + 1 if prev else 0
            # actually: value = previous value + 1
            val = offsets[order[-1]] + 1
        else:
            expr2 = expr
            for k, v in offsets.items():
                expr2 = re.sub(rf"\b{k}\b", str(v), expr2)
            val = eval(expr2)       # noqa: S307 — trusted constants
        offsets[name] = val
        order.append(name)
    total = None
    m2 = re.search(r"#define VVC_CONTEXTS (\d+)", src) or \
        re.search(r"SYNTAX_ELEMENT_LAST\s*=\s*(\w+)", src)
    # derive total from init table length below instead

    # --- init values -------------------------------------------------
    m = re.search(r"static const uint8_t init_values\[4\]\[[^\]]*\] = "
                  r"\{(.*?)\n\};", src, re.S)
    tbl = m.group(1)
    tbl = re.sub(r"//.*", "", tbl)
    tbl = tbl.replace("CNU", "35")
    rows = []
    depth = 0
    cur = []
    for tok in re.split(r"([{}])", tbl):
        if tok == "{":
            depth += 1
            if depth == 1:
                cur = []
        elif tok == "}":
            if depth == 1:
                rows.append([int(x) for x in re.findall(r"\d+", " ".join(cur))])
            depth -= 1
        elif depth == 1:
            cur.append(tok)
    assert len(rows) == 4, len(rows)
    n = len(rows[0])
    assert all(len(r) == n for r in rows), [len(r) for r in rows]

    with open(OUT, "w") as f:
        f.write('"""VVC CABAC context layout + init values (generated '
                'by\ntools/gen_vvc_tables.py from the reference '
                'vvc/cabac.c; H.266 spec\nconstant tables). '
                'INIT_VALUES[3] is the shift-index row."""\n\n')
        f.write(f"NUM_CONTEXTS = {n}\n\n")
        f.write("CTX = {\n")
        for name in order:
            if name == "SYNTAX_ELEMENT_LAST":
                continue
            f.write(f"    {name!r}: {offsets[name]},\n")
        f.write("}\n\n")
        f.write("INIT_VALUES = [\n")
        for r in rows:
            f.write(f"    {r!r},\n")
        f.write("]\n")
    print(f"wrote {OUT}: {n} contexts, {len(order)} elements")


if __name__ == "__main__":
    main()
