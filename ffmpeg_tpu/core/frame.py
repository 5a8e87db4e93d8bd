"""Frame — the media frame container (analog of AVFrame, libavutil/frame.h:472).

Differences from the reference, by design for TPU:
  * Plane data are numpy or jax.Array per *component* (not per packed plane):
    video frames carry `planes[i]` shaped (h_c, w_c) in canonical component
    order (Y,U,V[,A] or R,G,B[,A]); packing only happens at I/O boundaries
    (core/imgutils.py). A batch-of-frames uses (N, h_c, w_c) — the natural
    HBM layout for Pallas/XLA kernels.
  * No manual refcounting: jax/numpy arrays are immutable-ish + GC'd; the
    AVBufferRef machinery (buffer.h:74) is unnecessary.
  * Audio frames carry `planes[ch]` shaped (nb_samples,) in native dtype
    (always channel-planar internally; `sample_fmt` records I/O packing).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Dict, List, Optional

import numpy as np

from ..formats import pixfmt as _pf
from ..formats import samplefmt as _sf
from ..formats.channel_layout import ChannelLayout
from ..utils.rational import NOPTS, Rational
from . import imgutils


@dataclass
class Frame:
    # common
    pts: int = NOPTS
    duration: int = 0
    time_base: Rational = field(default_factory=lambda: Rational(0, 1))
    side_data: Dict[str, Any] = field(default_factory=dict)
    opaque: Any = None
    key_frame: bool = True
    pict_type: str = "?"      # I/P/B/S/i/b/?

    # video
    width: int = 0
    height: int = 0
    format: Optional[str] = None            # pix_fmt or sample_fmt name
    sample_aspect_ratio: Rational = field(default_factory=lambda: Rational(0, 1))
    color_range: str = "unspecified"
    color_space: str = "unspecified"
    color_primaries: str = "unspecified"
    color_trc: str = "unspecified"
    chroma_location: str = "left"
    interlaced: bool = False
    top_field_first: bool = False

    # audio
    sample_rate: int = 0
    nb_samples: int = 0
    ch_layout: Optional[ChannelLayout] = None

    # data: list of per-component arrays (video) or per-channel (audio)
    planes: List[Any] = field(default_factory=list)

    # --- classification -------------------------------------------------------
    @property
    def is_video(self) -> bool:
        return self.width > 0 and self.height > 0

    @property
    def is_audio(self) -> bool:
        return self.nb_samples > 0 or (self.sample_rate > 0 and not self.is_video)

    # --- video constructors ---------------------------------------------------
    @staticmethod
    def video(width: int, height: int, fmt: str, planes=None, **kw) -> "Frame":
        f = Frame(width=width, height=height, format=str(_pf.get(fmt).name), **kw)
        if planes is not None:
            f.planes = list(planes)
        else:
            f.planes = imgutils.fill_black(fmt, width, height)
        return f

    @staticmethod
    def from_bytes(buf: bytes, fmt: str, width: int, height: int, **kw) -> "Frame":
        comps = imgutils.unpack(buf, fmt, width, height)
        return Frame.video(width, height, fmt, planes=comps, **kw)

    def to_bytes(self) -> bytes:
        comps = [np.asarray(p) for p in self.planes]
        return imgutils.pack(comps, self.format, self.width, self.height)

    # --- audio constructors -----------------------------------------------------
    @staticmethod
    def audio(data: np.ndarray, sample_rate: int, fmt: str = "fltp",
              ch_layout: Optional[ChannelLayout] = None, **kw) -> "Frame":
        """data: (channels, nb_samples)."""
        data = np.atleast_2d(np.asarray(data))
        ch, n = data.shape
        from ..formats.channel_layout import default_layout
        return Frame(
            sample_rate=sample_rate, nb_samples=n,
            ch_layout=ch_layout or default_layout(ch),
            format=_sf.get(fmt).name,
            planes=[data[c] for c in range(ch)], **kw)

    @property
    def audio_data(self) -> np.ndarray:
        """(channels, nb_samples) view of audio planes."""
        return np.stack([np.asarray(p) for p in self.planes])

    # --- helpers -----------------------------------------------------------------
    @property
    def pix_desc(self) -> Optional[_pf.PixFmtDescriptor]:
        if self.is_video and self.format:
            return _pf.get(self.format)
        return None

    def numpy(self) -> "Frame":
        """Materialize all planes on host as numpy."""
        f = self.clone_props()
        f.planes = [np.asarray(p) for p in self.planes]
        return f

    def clone_props(self) -> "Frame":
        """Copy metadata, share plane references (av_frame_ref analog)."""
        f = replace(self)
        f.planes = list(self.planes)
        f.side_data = dict(self.side_data)
        return f

    def best_effort_pts_seconds(self) -> Optional[float]:
        if self.pts == NOPTS or not self.time_base:
            return None
        return self.pts * self.time_base.num / self.time_base.den

    def __repr__(self) -> str:  # pragma: no cover
        if self.is_video:
            return (f"<Frame video {self.width}x{self.height} {self.format} "
                    f"pts={self.pts}>")
        return (f"<Frame audio {self.nb_samples}s@{self.sample_rate} "
                f"{self.format} pts={self.pts}>")
