"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the real
multi-chip path via __graft_entry__.dryrun_multichip). This must run before
jax is imported anywhere.
"""

import os
import subprocess
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores JAX_PLATFORMS env; force CPU via the config
# API instead (must happen before any backend initialization).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
DATA = REPO / "tests" / "data"
REF_FFMPEG = Path("/tmp/ffbuild/ffmpeg")
REF_FFPROBE = Path("/tmp/ffbuild/ffprobe")

# Golden record/replay layer: with the oracle built, invocations can be
# recorded (FFTPU_GOLDEN_RECORD=1); without it, committed vectors replay
# so a clean clone still validates the differential suite (tests whose
# vectors aren't recorded skip individually).
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location("golden", Path(__file__).parent
                                     / "golden.py")
golden = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(golden)

golden.install([REF_FFMPEG, REF_FFPROBE])


def have_ref() -> bool:
    return REF_FFMPEG.exists() or golden.have_golden()


def run_ref(args, **kw):
    """Run the locally built reference ffmpeg binary."""
    return subprocess.run(
        [str(REF_FFMPEG), "-hide_banner", "-nostdin", *args],
        check=True, capture_output=True, **kw)


@pytest.fixture(scope="session")
def ref_ffmpeg():
    if not have_ref():
        pytest.skip("reference ffmpeg binary not built (/tmp/ffbuild)")
    return run_ref


requires_ref = pytest.mark.skipif(
    not have_ref(), reason="reference ffmpeg not built")


def own_y4m_clip(path, size=(128, 96), nframes=5):
    """Oracle-less fallback: generate a y4m clip with our own testsrc +
    scaler + y4m muxer (fixtures must not hard-require the reference)."""
    from ffmpeg_tpu.filters import get_filter
    from ffmpeg_tpu.io import open_output
    from ffmpeg_tpu.scale.swscale import scale_frame
    from ffmpeg_tpu.io.stream import CodecParameters, MediaType
    from ffmpeg_tpu.utils.rational import Rational

    w, h = size
    m = open_output(str(path), format="yuv4mpegpipe")
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="rawvideo",
                          width=w, height=h, pix_fmt="yuv420p",
                          framerate=Rational(25, 1))
    m.add_stream(par, time_base=Rational(1, 25))
    from ffmpeg_tpu.core.packet import Packet
    for fr in get_filter("testsrc")(f"size={w}x{h}").generate(nframes):
        yuv = scale_frame(fr, w, h, "yuv420p")
        data = b"".join(np.ascontiguousarray(p).tobytes() for p in yuv.planes)
        m.write_packet(Packet(data=data, pts=fr.pts, dts=fr.pts,
                              stream_index=0, duration=1))
    m.write_trailer()
    m.close()
    return path


def own_avi_clip(path, size=(160, 120)):
    """Oracle-less fallback: mjpeg+pcm_s16le AVI via our own encoder/muxer."""
    from ffmpeg_tpu.codecs import CodecContext
    from ffmpeg_tpu.filters import get_filter
    from ffmpeg_tpu.io import open_output
    from ffmpeg_tpu.scale.swscale import scale_frame
    from ffmpeg_tpu.io.stream import CodecParameters, MediaType
    from ffmpeg_tpu.utils.rational import Rational

    w, h = size
    m = open_output(str(path), format="avi")
    from ffmpeg_tpu.formats.channel_layout import default_layout
    vpar = CodecParameters(codec_type=MediaType.VIDEO, codec_id="mjpeg",
                           width=w, height=h, pix_fmt="yuvj420p",
                           framerate=Rational(25, 1))
    apar = CodecParameters(codec_type=MediaType.AUDIO, codec_id="pcm_s16le",
                           sample_rate=44100, sample_fmt="s16",
                           ch_layout=default_layout(1), block_align=2,
                           bits_per_coded_sample=16)
    m.add_stream(vpar, time_base=Rational(1, 25))
    m.add_stream(apar, time_base=Rational(1, 44100))
    enc = CodecContext.open_encoder(vpar, options={"quality": 90})
    from ffmpeg_tpu.core.packet import Packet
    pkts = []
    for fr in get_filter("testsrc")(f"size={w}x{h}").generate(25):
        yuv = scale_frame(fr, w, h, "yuv420p", dst_range=True)
        enc.send_frame(yuv)
        pkt = enc.receive_packet()
        pkt.stream_index = 0
        pkt.pts = pkt.dts = fr.pts
        pkt.duration = 1
        pkts.append((fr.pts / 25.0, 0, pkt))
    for i, fr in enumerate(get_filter("sine")(
            "frequency=440:sample_rate=44100").generate(43)):
        pcm = np.clip(np.asarray(fr.planes[0]).reshape(-1) * 32767,
                      -32768, 32767).astype("<i2").tobytes()
        pkts.append((fr.pts / 44100.0, 1,
                     Packet(data=pcm, pts=fr.pts, dts=fr.pts,
                            stream_index=1, duration=1024)))
    for _, _, pkt in sorted(pkts, key=lambda t: (t[0], t[1])):
        m.write_packet(pkt)
    m.write_trailer()
    m.close()
    return path
