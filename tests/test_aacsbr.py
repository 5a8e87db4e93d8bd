"""HE-AAC (SBR) tests: reference-encoded AAC-LC frames are spliced
with crafted SBR extension payloads (our own writer mirroring the
spec syntax); the reference decoder and ours must then produce the
same 2x-rate output within an SNR gate."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs.aac import SAMPLE_RATES
from ffmpeg_tpu.codecs.aacsbr import HUFF, SBRContext
from ffmpeg_tpu.codecs.bitstream import BitReader
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational


class Bits:
    def __init__(self):
        self.bits = []

    def u(self, v, n):
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def huff(self, idx, value):
        ln, code = HUFF[idx][1][value]
        self.u(code, ln)


def _adts_frames(data):
    out = []
    pos = 0
    while pos + 7 <= len(data):
        if not (data[pos] == 0xFF and (data[pos + 1] & 0xF6) == 0xF0):
            break
        ln = ((data[pos + 3] & 3) << 11) | (data[pos + 4] << 3) | \
            (data[pos + 5] >> 5)
        out.append(data[pos:pos + ln])
        pos += ln
    return out


def _find_end(payload, dec):
    """→ bit position of the END element in an LC AU (walks the
    element syntax with the decoder's own parser)."""
    br = BitReader(payload)
    while True:
        p = br.pos
        elem = br.get(3)
        if elem == 7:                     # END
            return p
        if elem in (0, 3):                # SCE/LFE
            br.get(4)
            dec._decode_ics_element(br)
        elif elem == 1:                   # CPE
            br.get(4)
            dec._decode_cpe(br)
        elif elem == 6:                   # FIL
            cnt = br.get(4)
            if cnt == 15:
                cnt += br.get(8) - 1
            br.skip(8 * cnt)
        else:
            raise AssertionError(f"unexpected element {elem}")


def write_sbr_payload(ctx_probe, rng, header=True, num_env_log2=1,
                      start_freq=5, stop_freq=3, noise_start=18,
                      env_base=25, invf=2, freq_res=0, ext_bits=None):
    """→ bit list of one sbr_single_channel_element payload."""
    w = Bits()
    w.u(1 if header else 0, 1)
    if header:
        w.u(1, 1)                         # amp_res
        w.u(start_freq, 4)
        w.u(stop_freq, 4)
        w.u(0, 3)                         # xover_band
        w.u(0, 2)                         # reserved
        w.u(0, 1)                         # extra1
        w.u(0, 1)                         # extra2
    n0, n1, n_q = ctx_probe
    nb = n1 if freq_res else n0
    num_env = 1 << num_env_log2
    amp_res = 0 if num_env == 1 else 1
    w.u(0, 1)                             # bs_data_extra
    # grid: FIXFIX
    w.u(0, 2)
    w.u(num_env_log2, 2)
    w.u(freq_res, 1)
    # dtdf: all start-value coded
    for _ in range(num_env):
        w.u(0, 1)
    num_noise = 2 if num_env > 1 else 1
    for _ in range(num_noise):
        w.u(0, 1)
    # invf
    for _ in range(n_q):
        w.u(invf, 2)
    # envelopes
    t_idx = 4 if amp_res else 0           # T_HUFFMAN_ENV_{3_0,1_5}DB
    f_idx = 5 if amp_res else 1
    for e in range(num_env):
        w.u(env_base + int(rng.integers(0, 6)), 6 if amp_res else 7)
        for _ in range(nb - 1):
            w.huff(f_idx, int(rng.integers(-2, 3)))
    # noise
    for e in range(num_noise):
        w.u(noise_start + int(rng.integers(0, 3)), 5)
        for _ in range(n_q - 1):
            w.huff(5, int(rng.integers(-1, 2)))
    w.u(0, 1)                             # bs_add_harmonic_flag
    if ext_bits is None:
        w.u(0, 1)                         # bs_extended_data
    else:
        # bs_extended_data: extension_id (2 bits) + payload, padded
        # to the signalled byte count (aacsbr read_sbr_extension)
        w.u(1, 1)
        total = 2 + len(ext_bits)
        cnt = (total + 7) // 8
        if cnt >= 15:
            w.u(15, 4)
            w.u(cnt - 15, 8)
        else:
            w.u(cnt, 4)
        w.u(2, 2)                         # EXTENSION_ID_PS
        for b in ext_bits:
            w.u(b, 1)
        for _ in range(cnt * 8 - total):
            w.u(0, 1)
    return w.bits


def probe_band_counts(core_rate, start_freq, stop_freq):
    ctx = SBRContext(core_rate)
    ctx.spectrum = {"start_freq": start_freq, "stop_freq": stop_freq,
                    "xover_band": 0, "freq_scale": 2,
                    "alter_scale": 1, "noise_bands": 2}
    ctx.make_f_master()
    ctx.make_f_derived()
    return ctx.n[0], ctx.n[1], ctx.n_q


def splice_sbr(frames, core_rate, seed=0, **kw):
    """Insert a crafted SBR FIL element before END in every AU."""
    rng = np.random.default_rng(seed)
    from ffmpeg_tpu.codecs.aac import AacDecoder
    par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="aac",
                          sample_rate=core_rate)
    dec = AacDecoder(par)
    dec.sample_rate = core_rate
    dec.sr_index = SAMPLE_RATES.index(core_rate)
    counts = probe_band_counts(core_rate,
                               kw.get("start_freq", 5),
                               kw.get("stop_freq", 3))
    out = []
    for fi, fr in enumerate(frames):
        crc_absent = fr[1] & 1
        hdr = bytearray(fr[:7 if crc_absent else 9])
        payload = bytes(fr[len(hdr):])
        end_pos = _find_end(payload, dec)
        head_bits = []
        for i in range(end_pos):
            head_bits.append((payload[i >> 3] >> (7 - (i & 7))) & 1)
        sbr_bits = write_sbr_payload(counts, rng, header=True, **kw)
        total = 4 + len(sbr_bits)
        cnt = (total + 7) // 8
        fil = Bits()
        fil.u(6, 3)                       # FIL
        if cnt >= 15:
            # count escape: total = 15 + esc - 1 (esc byte itself is
            # not included in the byte count)
            fil.u(15, 4)
            fil.u(cnt - 14, 8)
        else:
            fil.u(cnt, 4)
        fil.u(13, 4)                      # EXT_SBR_DATA
        bits = head_bits + fil.bits + sbr_bits
        bits += [0] * (cnt * 8 - total)   # FIL padding
        bits += [1, 1, 1]                 # END
        while len(bits) % 8:
            bits.append(0)
        body = bytearray(len(bits) // 8)
        for i, b in enumerate(bits):
            body[i >> 3] |= b << (7 - (i & 7))
        ln = len(hdr) + len(body)
        hdr[3] = (hdr[3] & 0xFC) | ((ln >> 11) & 3)
        hdr[4] = (ln >> 3) & 0xFF
        hdr[5] = (hdr[5] & 0x1F) | ((ln & 7) << 5)
        out.append(bytes(hdr) + bytes(body))
    return out


def _make_lc(tmp_path, rate=24000):
    f = tmp_path / "lc.aac"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "lavfi", "-i",
         f"sine=frequency=600:sample_rate={rate}", "-t", "0.6",
         "-c:a", "aac", "-b:a", "40k", "-f", "adts", str(f)],
        check=True)
    return _adts_frames(f.read_bytes())


def _make_lc_noise(tmp_path, rate=24000):
    """Pink-ish noise core: broadband content keeps the SBR LPC
    covariance well-conditioned, so the whole chain tracks the
    reference to float precision (the pure-sine core does not — see
    test_sbr_sine)."""
    import struct
    rng = np.random.default_rng(7)
    w = rng.normal(size=rate)
    X = np.fft.rfft(w)
    X /= np.maximum(np.arange(len(X)), 1) ** 0.5
    sig = np.fft.irfft(X, len(w))
    sig = (0.4 * sig / np.abs(sig).max()).astype(np.float32)
    wav = tmp_path / "src.wav"
    data = sig.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt " + \
        struct.pack("<IHHIIHH", 16, 3, 1, rate, rate * 4, 4, 32) + \
        b"data" + struct.pack("<I", len(data))
    wav.write_bytes(hdr + data)
    f = tmp_path / "lc.aac"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(wav), "-c:a",
         "aac", "-b:a", "48k", "-f", "adts", str(f)], check=True)
    return _adts_frames(f.read_bytes())


def _snr(a, b):
    n = min(len(a), len(b))
    a, b = a[:n].astype(np.float64), b[:n].astype(np.float64)
    err = np.mean((a - b) ** 2)
    sig = np.mean(b ** 2)
    return 10 * np.log10(sig / max(err, 1e-30))


def _decode_both(tmp_path, frames, core_rate):
    f = tmp_path / "he.aac"
    f.write_bytes(b"".join(frames))
    wav = tmp_path / "ref.wav"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(f), "-c:a",
         "pcm_f32le", "-y", str(wav)], check=True)
    raw = wav.read_bytes()
    ref = np.frombuffer(raw[raw.find(b"data") + 8:], np.float32)
    par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="aac",
                          sample_rate=core_rate)
    dec = CodecContext.open_decoder(par)
    pkts = [Packet(data=fr, pts=i * 1024,
                   time_base=Rational(1, core_rate))
            for i, fr in enumerate(frames)]
    outs = dec.decode_all(pkts)
    ours = np.concatenate([np.asarray(o.planes[0]).ravel()
                           for o in outs])
    if len(ref) == 2 * len(ours):
        # the reference guesses HE-AACv2 for mono SBR; without PS
        # data both channels are copies of the mono decode
        assert np.array_equal(ref[0::2], ref[1::2])
        ref = ref[0::2]
    return ours, ref


@requires_ref
@pytest.mark.parametrize("seed", [0, 3])
def test_sbr_sce(tmp_path, seed):
    frames = _make_lc_noise(tmp_path)
    he = splice_sbr(frames, 24000, seed=seed)
    ours, ref = _decode_both(tmp_path, he, 24000)
    assert len(ours) == len(ref)
    snr = _snr(ours, ref)
    assert snr > 80, f"SBR SNR {snr:.1f} dB"


@requires_ref
def test_sbr_multi_env(tmp_path):
    frames = _make_lc_noise(tmp_path)
    he = splice_sbr(frames, 24000, seed=7, num_env_log2=2,
                    freq_res=1)
    ours, ref = _decode_both(tmp_path, he, 24000)
    snr = _snr(ours, ref)
    assert snr > 80, f"SBR SNR {snr:.1f} dB"


@requires_ref
def test_sbr_no_invf(tmp_path):
    frames = _make_lc_noise(tmp_path)
    he = splice_sbr(frames, 24000, seed=11, invf=0, noise_start=25)
    ours, ref = _decode_both(tmp_path, he, 24000)
    snr = _snr(ours, ref)
    assert snr > 80, f"SBR SNR {snr:.1f} dB"


@requires_ref
def test_sbr_sine_core(tmp_path):
    """Pure-tone core: the reference's own sbr_hf_inverse_filter is
    numerically unstable (catastrophic cancellation in the covariance
    determinant for perfectly-predictable input — aacsbr.c warns
    'does not seem numerically stable'), so the prediction alphas are
    not reproducible across arithmetic orderings.  The HF envelope
    still matches (gains renormalise band energy); only the waveform
    detail differs.  Gate accordingly."""
    frames = _make_lc(tmp_path)
    he = splice_sbr(frames, 24000, seed=0)
    ours, ref = _decode_both(tmp_path, he, 24000)
    snr = _snr(ours, ref)
    assert snr > 25, f"SBR SNR {snr:.1f} dB"
