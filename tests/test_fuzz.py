"""Trasher-style robustness fuzzing (analogs of tools/trasher.c +
tools/target_dec_fuzzer.c): random byte corruption and truncation over
every demuxer/decoder entry point. Malformed input must surface as
FFTPUError (InvalidData & friends) or decode to garbage — never as a
raw Python exception (IndexError, struct.error, ZeroDivisionError,
OverflowError...).

The corpus is generated with OUR encoders/muxers, so this file needs
no reference binary and runs in a clean clone. FUZZ_N scales the
mutation count per corpus file (default small for CI; set FUZZ_N=600
for a ~10k-mutation full run).
"""

import io
import os
import zlib

import numpy as np
import pytest

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io import open_input
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.error import FFTPUError
from ffmpeg_tpu.utils.rational import Rational

FUZZ_N = int(os.environ.get("FUZZ_N", "25"))

# exceptions a decoder is allowed to raise on garbage: the library's
# own error hierarchy only
ALLOWED = (FFTPUError,)

MAX_FRAMES = 64            # stop runaway outputs
MAX_PIXELS = 1 << 22       # refuse absurd frames (allocation guard)


def _mutate(data: bytes, rng) -> bytes:
    buf = bytearray(data)
    kind = rng.integers(0, 10)
    if kind == 0 and len(buf) > 4:                 # truncate
        return bytes(buf[: int(rng.integers(1, len(buf)))])
    n = int(rng.integers(1, max(2, len(buf) // 64)))
    for _ in range(n):
        pos = int(rng.integers(0, len(buf)))
        buf[pos] = int(rng.integers(0, 256))
    return bytes(buf)


def _try_decode_container(data: bytes, fmt=None):
    d = open_input(io.BytesIO(data), format=fmt)
    decoders = {}
    for st in d.streams:
        try:
            decoders[st.index] = CodecContext.open_decoder(st.codecpar)
        except FFTPUError:
            pass
    nf = 0
    for pkt in d.packets():
        dec = decoders.get(pkt.stream_index)
        if dec is None:
            continue
        from ffmpeg_tpu.utils.error import EndOfStream, TryAgain
        dec.send_packet(pkt)
        while True:
            try:
                f = dec.receive_frame()
            except (TryAgain, EndOfStream):
                break
            if f.width and f.height and \
                    f.width * f.height > MAX_PIXELS:
                raise FFTPUError("fuzz: oversized frame")
            nf += 1
            if nf > MAX_FRAMES:
                return
        if nf > MAX_FRAMES:
            return


class _Hang(BaseException):
    """BaseException so the library's InvalidData contract nets
    (which catch Exception) cannot swallow the watchdog."""


def _fuzz_one(data: bytes, fmt, seed, budget_s=10):
    import signal

    def on_alarm(sig, frm):
        raise _Hang()

    old = signal.signal(signal.SIGALRM, on_alarm)
    rng = np.random.default_rng(seed)
    try:
        for it in range(FUZZ_N):
            mutated = _mutate(data, rng)
            try:
                signal.alarm(budget_s)
                _try_decode_container(mutated, fmt)
            except ALLOWED:
                pass
            except MemoryError:
                pass                 # allocator refused a silly size
            except _Hang as e:
                raise AssertionError(
                    f"fmt={fmt} iter={it}: decode exceeded "
                    f"{budget_s}s (unbounded loop on garbage)") from e
            except Exception as e:   # noqa: BLE001 — the test's point
                raise AssertionError(
                    f"fmt={fmt} iter={it}: raw {type(e).__name__}: "
                    f"{e}") from e
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


# --------------------------------------------------------------------------
# corpus builders (our own encoders/muxers; no oracle)


def _testsrc_frames(n=3, w=64, h=48, fmt="yuv420p"):
    from ffmpeg_tpu.filters import get_filter
    from ffmpeg_tpu.scale.swscale import scale_frame
    src = get_filter("testsrc")(f"size={w}x{h}")
    out = []
    for fr in src.generate(n):
        out.append(scale_frame(fr, w, h, fmt, dst_range=True))
    return out


def _encode_video(codec, n=3, w=64, h=48, opts=None, fmt="yuv420p"):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id=codec,
                          width=w, height=h)
    enc = CodecContext.open_encoder(par, options=opts or {})
    pkts = []
    for fr in _testsrc_frames(n, w, h, fmt):
        enc.send_frame(fr)
        pkts.append(enc.receive_packet())
    return par, pkts


def _mux(muxer, par, pkts):
    from ffmpeg_tpu.io import open_output
    bio = io.BytesIO()
    m = open_output(bio, format=muxer)
    st = m.add_stream(codecpar=par, time_base=Rational(1, 25))
    m.write_header()
    for i, p in enumerate(pkts):
        p.stream_index = st.index
        p.pts = p.dts = i
        p.duration = 1
        p.time_base = Rational(1, 25)
        m.write_packet(p)
    m.write_trailer()
    return bio.getvalue()


def _sine_s16(n=2048, rate=8000):
    t = np.arange(n) / rate
    return (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int16)


@pytest.fixture(scope="module")
def corpus():
    from ffmpeg_tpu.core.frame import Frame
    out = {}

    par, pkts = _encode_video("mjpeg", opts={"quality": 70})
    out["mjpeg"] = (b"".join(p.data for p in pkts), "mjpeg")
    for muxer in ("avi", "matroska", "mov", "mpegts"):
        try:
            out[muxer] = (_mux(muxer, par, pkts), None)
        except FFTPUError:
            pass

    # image codecs through their own encoders (rgb24 input);
    # gif/webp packets need their container, so go through the muxer
    for codec in ("png", "qoi", "bmp", "tiff"):
        try:
            p2, pk = _encode_video(codec, n=1, fmt="rgb24")
            out[codec] = (pk[0].data, None)     # probe-based open
        except (FFTPUError, KeyError):
            pass
    for codec in ("gif", "webp"):
        try:
            p2, pk = _encode_video(codec, n=2, fmt="rgb24")
            out[codec] = (_mux(codec, p2, pk), None)
        except (FFTPUError, KeyError):
            pass

    # wav with PCM
    from ffmpeg_tpu.formats.channel_layout import default_layout
    pcm = _sine_s16()
    apar = CodecParameters(codec_type=MediaType.AUDIO,
                           codec_id="pcm_s16le", sample_rate=8000,
                           ch_layout=default_layout(1))
    pkts = [Packet(data=pcm[i:i + 1024].tobytes(), pts=i)
            for i in range(0, 2048, 1024)]
    out["wav"] = (_mux("wav", apar, pkts), None)

    # flv carries AAC from our encoder
    try:
        apar2 = CodecParameters(codec_type=MediaType.AUDIO,
                                codec_id="aac", sample_rate=44100,
                                sample_fmt="fltp",
                                ch_layout=default_layout(1))
        enc = CodecContext.open_encoder(apar2)
        sine = (np.sin(2 * np.pi * 440 * np.arange(4096) / 44100)
                .astype(np.float32))
        fr = Frame.audio(sine[None, :1024], 44100, fmt="fltp")
        enc.send_frame(fr)
        apkts = [enc.receive_packet()]
        apar2 = enc.par
        out["flv"] = (_mux("flv", apar2, apkts), None)
    except Exception:                    # noqa: BLE001 — corpus only
        pass

    # flac: "fLaC" + a STREAMINFO metadata block (type 0, last=1,
    # 34 bytes from the encoder's extradata) + frames
    try:
        fpar = CodecParameters(codec_type=MediaType.AUDIO,
                               codec_id="flac", sample_rate=8000,
                               sample_fmt="s16",
                               ch_layout=default_layout(1))
        enc = CodecContext.open_encoder(fpar)
        fr = Frame.audio(pcm[None, :], 8000, fmt="s16")
        enc.send_frame(fr)
        enc.send_frame(None)
        flac_pkts = []
        from ffmpeg_tpu.utils.error import EndOfStream, TryAgain
        while True:
            try:
                flac_pkts.append(enc.receive_packet())
            except (TryAgain, EndOfStream):
                break
        # the encoder's first packet IS the fLaC header
        blob = b"".join(p.data for p in flac_pkts)
        if blob.startswith(b"fLaC"):
            out["flac"] = (blob, "flac")
    except Exception:                    # noqa: BLE001 — corpus only
        pass

    return out


def test_fuzz_corpus_valid(corpus):
    """Every corpus entry must decode cleanly before mutation."""
    assert len(corpus) >= 8, sorted(corpus)
    for name, (data, fmt) in corpus.items():
        _try_decode_container(data, fmt)


@pytest.mark.parametrize("name", ["mjpeg", "avi", "matroska", "mov",
                                  "mpegts", "flv", "png", "qoi",
                                  "bmp", "gif", "webp", "tiff",
                                  "wav", "flac"])
def test_fuzz(corpus, name):
    if name not in corpus:
        pytest.skip(f"no corpus for {name}")
    data, fmt = corpus[name]
    _fuzz_one(data, fmt, seed=zlib.crc32(name.encode()) & 0xFFFF)
