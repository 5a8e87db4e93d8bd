"""HEVC in-loop filters (deblocking + SAO; reference:
libavcodec/hevc/filter.c). Deblocking lands with the next milestone;
crafted test streams disable it until then."""

from ...utils.error import NotSupported


def deblock_frame(dec):
    raise NotSupported("hevc: deblocking not yet implemented")
