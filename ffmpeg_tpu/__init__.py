"""ffmpeg_tpu — a TPU-native media framework with FFmpeg's capabilities.

Built from scratch for JAX/XLA/Pallas: containers and entropy coding on the
host, all dense math (scaling, color conversion, transforms, motion comp,
loop filters, resampling, filter graphs) as fused XLA programs on TPU.
See SURVEY.md for the blueprint and layer map.
"""

__version__ = "0.1.0"

from .core.frame import Frame
from .core.packet import Packet
from .utils.rational import Rational
from .utils import log

__all__ = ["Frame", "Packet", "Rational", "log", "__version__"]
