"""Structured output writers for the probe tool (analogs of
fftools/textformat/tf_{default,json,csv,flat,ini,compact}.c)."""

from __future__ import annotations

import json
from typing import Any, Dict, List


class Writer:
    def render(self, sections: List[tuple]) -> str:
        """sections: list of (section_name, dict) in print order."""
        raise NotImplementedError


class DefaultWriter(Writer):
    def render(self, sections):
        out = []
        for name, kv in sections:
            out.append(f"[{name.upper()}]")
            for k, v in kv.items():
                out.append(f"{k}={v}")
            out.append(f"[/{name.upper()}]")
        return "\n".join(out) + "\n"


class JsonWriter(Writer):
    def render(self, sections):
        grouped: Dict[str, Any] = {}
        for name, kv in sections:
            if name in ("stream", "packet", "frame"):
                grouped.setdefault(name + "s", []).append(kv)
            else:
                grouped[name] = kv
        return json.dumps(grouped, indent=4) + "\n"


class CsvWriter(Writer):
    def render(self, sections):
        out = []
        for name, kv in sections:
            out.append(",".join([name] + [str(v) for v in kv.values()]))
        return "\n".join(out) + "\n"


class FlatWriter(Writer):
    def render(self, sections):
        out = []
        counts: Dict[str, int] = {}
        for name, kv in sections:
            idx = counts.get(name, 0)
            counts[name] = idx + 1
            prefix = f"{name}s.{name}.{idx}." if name in ("stream", "packet", "frame") \
                else f"{name}."
            for k, v in kv.items():
                sv = v if isinstance(v, (int, float)) else f'"{v}"'
                out.append(f"{prefix}{k}={sv}")
        return "\n".join(out) + "\n"


class IniWriter(Writer):
    def render(self, sections):
        out = []
        counts: Dict[str, int] = {}
        for name, kv in sections:
            idx = counts.get(name, 0)
            counts[name] = idx + 1
            hdr = f"{name}s.{name}.{idx}" if name in ("stream", "packet", "frame") \
                else name
            out.append(f"[{hdr}]")
            for k, v in kv.items():
                out.append(f"{k}={v}")
            out.append("")
        return "\n".join(out) + "\n"


class CompactWriter(Writer):
    def render(self, sections):
        out = []
        for name, kv in sections:
            out.append("|".join([name] +
                                [f"{k}={v}" for k, v in kv.items()]))
        return "\n".join(out) + "\n"


WRITERS = {
    "default": DefaultWriter,
    "json": JsonWriter,
    "csv": CsvWriter,
    "flat": FlatWriter,
    "ini": IniWriter,
    "compact": CompactWriter,
}


def get_writer(name: str) -> Writer:
    cls = WRITERS.get(name)
    if cls is None:
        raise ValueError(f"unknown output format {name!r}")
    return cls()
