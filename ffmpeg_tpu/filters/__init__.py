"""Filter graph layer (libavfilter analog)."""

from .base import Filter, TraceableFilter, filter_names, get_filter, register_filter
from .graph import FilterGraph, FusedChain, parse_graph

# register built-in filters
from . import video, video2, video3, video4, video5, video6, video7, video8, audio, audio2, audio3, audio4, audio5, audio6, sources  # noqa: F401

__all__ = ["Filter", "TraceableFilter", "FilterGraph", "FusedChain",
           "parse_graph", "filter_names", "get_filter", "register_filter"]
