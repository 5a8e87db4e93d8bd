"""Helpers to generate inputs & golden outputs with the reference ffmpeg."""

from __future__ import annotations

import subprocess
from pathlib import Path

import numpy as np

REF = Path("/tmp/ffbuild/ffmpeg")
REFPROBE = Path("/tmp/ffbuild/ffprobe")


def run(args: list[str]) -> bytes:
    p = subprocess.run([str(REF), "-hide_banner", "-nostdin", "-v", "error", *args],
                       check=True, capture_output=True)
    return p.stdout


def gen_rawvideo(w: int, h: int, pix_fmt: str, nframes: int = 1,
                 src: str = "testsrc2", rate: int = 25) -> bytes:
    """Synthesize frames with lavfi and return raw packed video bytes."""
    return run([
        "-f", "lavfi", "-i", f"{src}=size={w}x{h}:rate={rate}",
        "-frames:v", str(nframes), "-pix_fmt", pix_fmt,
        "-f", "rawvideo", "-"])


def ref_scale(raw: bytes, w: int, h: int, src_fmt: str, dst_w: int, dst_h: int,
              dst_fmt: str, flags: str = "bicubic", extra: str = "") -> bytes:
    """Run the reference scaler on raw frames → raw frames."""
    vf = f"scale={dst_w}:{dst_h}:flags={flags}{extra}"
    p = subprocess.run(
        [str(REF), "-hide_banner", "-nostdin", "-v", "error",
         "-f", "rawvideo", "-pix_fmt", src_fmt, "-video_size", f"{w}x{h}", "-i", "-",
         "-vf", vf, "-pix_fmt", dst_fmt, "-f", "rawvideo", "-"],
        input=raw, check=True, capture_output=True)
    return p.stdout


def gen_audio(rate: int = 48000, channels: int = 2, duration: float = 0.25,
              fmt: str = "s16le", freq: int = 440) -> bytes:
    ch_filter = f",aformat=channel_layouts={'stereo' if channels == 2 else 'mono'}"
    return run([
        "-f", "lavfi", "-i", f"sine=frequency={freq}:sample_rate={rate}",
        "-t", str(duration), "-af", f"volume=0.5{ch_filter if channels != 1 else ''}",
        "-f", fmt, "-"])


def psnr(a: np.ndarray, b: np.ndarray, maxval: float = 255.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(maxval * maxval / mse)
