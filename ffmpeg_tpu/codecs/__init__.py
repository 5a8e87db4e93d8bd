"""Codec layer (libavcodec analog)."""

from .codec import (Codec, CodecContext, decoder_names, encoder_names,
                    register_decoder, register_encoder)

# register built-in codecs
from . import parsers  # noqa: F401
from . import rawvideo, pcm, mjpeg, mjpeg_enc, mpeg12_enc, png, flac, flac_enc, ffv1, ffv1_enc, aac, aac_enc, mpeg12, images, subtitles, subtitles2, h264_enc, gif, mp3, mpeg4, h264, prores, prores_enc, dnxhd, dnxhd_enc, ac3, hevc, vvc, dca, vp9, vp8, webp, vorbis, opus, tiff, adpcm, av1, exr, mlp  # noqa: F401

__all__ = ["Codec", "CodecContext", "decoder_names", "encoder_names",
           "register_decoder", "register_encoder"]
