"""Opus SILK decoder tests.  The reference has no SILK encoder, so we
craft syntactically-valid SILK streams with our own range encoder
(mirroring the decoder's model walk with random parameter choices),
then require the reference decoder and ours to produce matching
48 kHz output."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs.opus import tables_gen as T
from ffmpeg_tpu.codecs.opus.rc import RangeCoder, RangeEncoder
from ffmpeg_tpu.codecs.opus.silk import SilkDecoder


class SilkWriter:
    """Emits one SILK superframe per call, tracking the cross-frame
    state the syntax depends on (gain coding mode, pitch-lag delta
    availability, stereo side-channel flushes)."""

    def __init__(self, rng, bandwidth, duration_ms, channels):
        self.rng = rng
        self.bw = bandwidth
        self.dur = duration_ms
        self.ch = channels
        self.coded = [False, False]
        self.prev_voiced = [0, 0]
        self.nb_frames = 1 + (duration_ms > 20) + (duration_ms > 40)
        self.subframes = duration_ms // self.nb_frames // 5

    def _u(self, n):
        return int(self.rng.integers(0, n))

    def _frame(self, enc, frame_num, channel, active, active1,
               voiced_bias):
        wb = self.bw == 2
        order = 16 if wb else 10
        midonly = 0
        if self.ch == 2 and channel == 0:
            enc.enc_cdf(self._u(25), T.SILK_MODEL_STEREO_S1)
            enc.enc_cdf(self._u(3), T.SILK_MODEL_STEREO_S2)
            enc.enc_cdf(self._u(5), T.SILK_MODEL_STEREO_S3)
            enc.enc_cdf(self._u(3), T.SILK_MODEL_STEREO_S2)
            enc.enc_cdf(self._u(5), T.SILK_MODEL_STEREO_S3)
            if not active1:
                midonly = 0              # keep side coded
                enc.enc_cdf(midonly, T.SILK_MODEL_MID_ONLY)
        if not active:
            voiced = 0
            enc.enc_cdf(self._u(2), T.SILK_MODEL_FRAME_TYPE_INACTIVE)
        else:
            voiced = 1 if self.rng.random() < voiced_bias else 0
            qoffset = self._u(2)
            enc.enc_cdf(voiced * 2 + qoffset,
                        T.SILK_MODEL_FRAME_TYPE_ACTIVE)
        for i in range(self.subframes):
            if i == 0 and (frame_num == 0 or
                           not self.coded[channel]):
                enc.enc_cdf(2 + self._u(2),
                            T.SILK_MODEL_GAIN_HIGHBITS[active + voiced])
                enc.enc_cdf(self._u(8), T.SILK_MODEL_GAIN_LOWBITS)
            else:
                enc.enc_cdf(self._u(16), T.SILK_MODEL_GAIN_DELTA)
        # LSF
        lsf_i1 = self._u(32)
        enc.enc_cdf(lsf_i1, T.SILK_MODEL_LSF_S1[int(wb)][voiced])
        sel = T.SILK_LSF_S2_MODEL_SEL_WB if wb else \
            T.SILK_LSF_S2_MODEL_SEL_NBMB
        for i in range(order):
            enc.enc_cdf(1 + self._u(7),
                        T.SILK_MODEL_LSF_S2[int(sel[lsf_i1][i])])
        if self.subframes == 4:
            enc.enc_cdf(self._u(5),
                        T.SILK_MODEL_LSF_INTERPOLATION_OFFSET)
        if voiced:
            lag_absolute = (not frame_num) or \
                (not self.prev_voiced[channel])
            if not lag_absolute:
                delta = self._u(21)
                enc.enc_cdf(delta, T.SILK_MODEL_PITCH_DELTA)
                if delta == 0:
                    lag_absolute = True
            if lag_absolute:
                models = [T.SILK_MODEL_PITCH_LOWBITS_NB,
                          T.SILK_MODEL_PITCH_LOWBITS_MB,
                          T.SILK_MODEL_PITCH_LOWBITS_WB]
                enc.enc_cdf(self._u(16),
                            T.SILK_MODEL_PITCH_HIGHBITS)
                enc.enc_cdf(self._u(len(models[self.bw]) - 2),
                            models[self.bw])
            if self.subframes == 2:
                if self.bw == 0:
                    enc.enc_cdf(self._u(3),
                                T.SILK_MODEL_PITCH_CONTOUR_NB10MS)
                else:
                    enc.enc_cdf(self._u(12),
                                T.SILK_MODEL_PITCH_CONTOUR_MBWB10MS)
            else:
                if self.bw == 0:
                    enc.enc_cdf(self._u(11),
                                T.SILK_MODEL_PITCH_CONTOUR_NB20MS)
                else:
                    enc.enc_cdf(self._u(34),
                                T.SILK_MODEL_PITCH_CONTOUR_MBWB20MS)
            ltpfilter = self._u(3)
            enc.enc_cdf(ltpfilter, T.SILK_MODEL_LTP_FILTER)
            sels = [T.SILK_MODEL_LTP_FILTER0_SEL,
                    T.SILK_MODEL_LTP_FILTER1_SEL,
                    T.SILK_MODEL_LTP_FILTER2_SEL]
            for i in range(self.subframes):
                enc.enc_cdf(self._u(len(sels[ltpfilter]) - 2),
                            sels[ltpfilter])
        if voiced and frame_num == 0:
            enc.enc_cdf(self._u(3), T.SILK_MODEL_LTP_SCALE_INDEX)
        # excitation
        enc.enc_cdf(self._u(4), T.SILK_MODEL_LCG_SEED)
        shellblocks = int(T.SILK_SHELL_BLOCKS[self.bw]
                          [self.subframes >> 2])
        ratelevel = self._u(9)
        enc.enc_cdf(ratelevel, T.SILK_MODEL_EXC_RATE[voiced])
        counts = [self._u(9) for _ in range(shellblocks)]
        for c in counts:
            enc.enc_cdf(c, T.SILK_MODEL_PULSE_COUNT[ratelevel])
        qoffset_high = 0  # only affects value assembly, not syntax
        for bi, total in enumerate(counts):
            if total == 0:
                continue
            # random split of `total` pulses over 16 locations
            leaves = np.zeros(16, int)
            for _ in range(total):
                leaves[self._u(16)] += 1

            def node_total(lo, hi):
                return int(leaves[lo:hi].sum())

            def emit(model, lo, hi):
                total_n = node_total(lo, hi)
                if total_n == 0:
                    return
                mid = (lo + hi) // 2
                child0 = node_total(lo, mid)
                off = ((total_n - 1 + 5) * (total_n - 1)) >> 1
                enc.enc_cdf(child0,
                            T.SILK_MODEL_PULSE_LOCATION[model][off:])
                if hi - lo > 2:
                    emit(model + 1, lo, mid)
                    emit(model + 1, mid, hi)

            emit(0, 0, 16)
            # no LSBs (counts <= 16); signs for nonzero leaves
            for v in leaves:
                if v:
                    neg = self._u(2)
                    enc.enc_cdf(
                        neg,
                        T.SILK_MODEL_EXCITATION_SIGN[active + voiced]
                        [qoffset_high][min(int(v), 6)])
        self.prev_voiced[channel] = voiced
        self.coded[channel] = True
        return midonly

    def superframe(self, voiced_bias=0.5):
        enc = RangeEncoder()
        active = [[1] * self.nb_frames for _ in range(self.ch)]
        for i in range(self.ch):
            for j in range(self.nb_frames):
                active[i][j] = 1 if self.rng.random() < 0.8 else 0
                enc.enc_log(active[i][j], 1)
            enc.enc_log(0, 1)            # no LBRR
        for i in range(self.nb_frames):
            for j in range(self.ch):
                active1 = active[1][i] if self.ch > 1 else 0
                self._frame(enc, i, j, active[j][i], active1,
                            voiced_bias)
        return enc.finish()


def make_stream(seed, config, channels, n_packets):
    """→ list of opus packets (TOC + payload).  Each packet is
    validated with a persistent shadow decode and kept tight: the
    reference treats trailing bytes as a CELT redundancy frame
    (dec.c: consumed + 17 <= size*8), so trailing zero bytes (a
    no-op for the range decoder, which reads zeros past the end) are
    stripped, and a packet that still has too much slack is
    re-crafted with fresh random draws."""
    rng = np.random.default_rng(seed)
    bandwidth = config // 4
    duration_ms = (10, 20, 40, 60)[config & 3]
    silk_rate = 8000 + 4000 * bandwidth
    w = SilkWriter(rng, bandwidth, duration_ms, channels)
    dec = SilkDecoder(channels)
    n = (silk_rate // 1000) * duration_ms
    pkts = []
    toc = (config << 3) | ((channels - 1) << 2)
    import copy
    while len(pkts) < n_packets:
        wsnap = (list(w.coded), list(w.prev_voiced))
        dsnap = copy.deepcopy(dec)
        data = w.superframe()
        data = data.rstrip(b"\x00") or b"\x00"
        out = [np.zeros(n, np.float32) for _ in range(channels)]
        rc = RangeCoder(data)
        dec.decode_superframe(rc, out, bandwidth, channels,
                              duration_ms)
        if rc.tell() + 17 <= 8 * len(data):
            # too much slack: rewind and retry with new draws
            w.coded, w.prev_voiced = wsnap
            dec = dsnap
            continue
        pkts.append(bytes([toc]) + data)
    return pkts


def opus_head(channels):
    return (b"OpusHead" + bytes([1, channels]) +
            (0).to_bytes(2, "little") +
            (48000).to_bytes(4, "little") +
            (0).to_bytes(2, "little") + bytes([0]))


def mux_mkv(tmp_path, pkts, config, channels, name="s.mkv"):
    from ffmpeg_tpu.io import open_output
    from ffmpeg_tpu.io.stream import CodecParameters, MediaType
    from ffmpeg_tpu.core.packet import Packet
    from ffmpeg_tpu.formats.channel_layout import default_layout
    from ffmpeg_tpu.utils.rational import Rational

    dur48 = int(T.FRAME_DURATION[config])
    path = tmp_path / name
    par = CodecParameters(codec_type=MediaType.AUDIO,
                          codec_id="opus", sample_rate=48000,
                          ch_layout=default_layout(channels),
                          extradata=opus_head(channels))
    mux = open_output(str(path), format="matroska")
    st = mux.add_stream(par, time_base=Rational(1, 48000))
    for i, p in enumerate(pkts):
        mux.write_packet(Packet(
            data=p, pts=i * dur48, dts=i * dur48, duration=dur48,
            stream_index=st.index, flags=1,
            time_base=Rational(1, 48000)))
    mux.write_trailer()
    mux.close()
    return path


def decode_ref(path, channels):
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(path), "-c:a",
         "pcm_f32le", "-f", "wav", "-"],
        check=True, capture_output=True).stdout
    off = raw.find(b"data") + 8
    a = np.frombuffer(raw[off:], np.float32)
    return a[:len(a) // channels * channels].reshape(-1, channels).T


def decode_ours(pkts, config, channels):
    from ffmpeg_tpu.codecs import CodecContext
    from ffmpeg_tpu.io.stream import CodecParameters, MediaType
    from ffmpeg_tpu.core.packet import Packet
    from ffmpeg_tpu.formats.channel_layout import default_layout
    from ffmpeg_tpu.utils.rational import Rational

    dur48 = int(T.FRAME_DURATION[config])
    par = CodecParameters(codec_type=MediaType.AUDIO,
                          codec_id="opus", sample_rate=48000,
                          ch_layout=default_layout(channels),
                          extradata=opus_head(channels))
    dec = CodecContext.open_decoder(par)
    frames = dec.decode_all(
        [Packet(data=p, pts=i * dur48, duration=dur48,
                time_base=Rational(1, 48000))
         for i, p in enumerate(pkts)])
    return np.concatenate(
        [np.stack([np.asarray(pl).ravel() for pl in f.planes])
         for f in frames], axis=1)


def run_case(tmp_path, seed, config, channels, n_packets=20,
             min_snr=100):
    pkts = make_stream(seed, config, channels, n_packets)
    path = mux_mkv(tmp_path, pkts, config, channels)
    ref = decode_ref(path, channels)
    ours = decode_ours(pkts, config, channels)
    n = min(ref.shape[1], ours.shape[1])
    assert n > 0
    assert abs(ref.shape[1] - ours.shape[1]) <= 960, \
        (ref.shape, ours.shape)
    a, b = ours[:, :n].astype(np.float64), ref[:, :n].astype(np.float64)
    err = np.mean((a - b) ** 2)
    sig = np.mean(b ** 2)
    snr = 10 * np.log10(max(sig, 1e-30) / max(err, 1e-30))
    assert snr > min_snr, f"SILK SNR {snr:.1f} dB (config {config})"
    return snr


@requires_ref
@pytest.mark.parametrize("config", [1, 5, 9])
def test_silk_mono_20ms(tmp_path, config):
    run_case(tmp_path, 100 + config, config, 1)


@requires_ref
def test_silk_mono_10ms(tmp_path):
    run_case(tmp_path, 7, 8, 1)


@requires_ref
def test_silk_mono_60ms(tmp_path):
    run_case(tmp_path, 11, 11, 1, n_packets=8)


@requires_ref
def test_silk_stereo(tmp_path):
    run_case(tmp_path, 23, 9, 2)


@requires_ref
def test_silk_nb_40ms(tmp_path):
    run_case(tmp_path, 31, 2, 1, n_packets=10)


def make_hybrid_stream(seed, config, channels, n_packets,
                       tail_bytes=24):
    """Hybrid (configs 12-15) packets: crafted SILK WB layer, an
    explicit no-redundancy flag, then random tail bytes that the CELT
    layer (bands 17+) parses as content — both decoders read the same
    bits, so output must still match."""
    rng = np.random.default_rng(seed)
    duration_ms = (10, 20)[config & 1]
    w = SilkWriter(rng, 2, duration_ms, channels)
    toc = (config << 3) | ((channels - 1) << 2)
    pkts = []
    for _ in range(n_packets):
        enc = RangeEncoder()
        for i in range(channels):
            enc.enc_log(1 if rng.random() < 0.8 else 0, 1)
            enc.enc_log(0, 1)
        # regenerate the VAD bits through the writer path instead
        enc = RangeEncoder()
        active = [[0] for _ in range(channels)]
        for i in range(channels):
            active[i][0] = 1 if rng.random() < 0.8 else 0
            enc.enc_log(active[i][0], 1)
            enc.enc_log(0, 1)
        for j in range(channels):
            active1 = active[1][0] if channels > 1 else 0
            w._frame(enc, 0, j, active[j][0], active1, 0.5)
        enc.enc_log(0, 12)              # no redundancy
        data = enc.finish()
        data += bytes(rng.integers(0, 256, tail_bytes, dtype=np.uint8))
        pkts.append(bytes([toc]) + data)
    return pkts


@requires_ref
@pytest.mark.parametrize("config", [13, 15])
def test_hybrid_mono(tmp_path, config):
    pkts = make_hybrid_stream(500 + config, config, 1, 15)
    path = mux_mkv(tmp_path, pkts, config, 1)
    ref = decode_ref(path, 1)
    ours = decode_ours(pkts, config, 1)
    n = min(ref.shape[1], ours.shape[1])
    assert n > 0 and abs(ref.shape[1] - ours.shape[1]) <= 960
    a, b = ours[:, :n].astype(np.float64), ref[:, :n].astype(np.float64)
    snr = 10 * np.log10(max(np.mean(b ** 2), 1e-30) /
                        max(np.mean((a - b) ** 2), 1e-30))
    assert snr > 100, f"hybrid SNR {snr:.1f} dB (config {config})"


@requires_ref
def test_hybrid_stereo_10ms(tmp_path):
    pkts = make_hybrid_stream(71, 12, 2, 15)
    path = mux_mkv(tmp_path, pkts, 12, 2)
    ref = decode_ref(path, 2)
    ours = decode_ours(pkts, 12, 2)
    n = min(ref.shape[1], ours.shape[1])
    assert n > 0
    a, b = ours[:, :n].astype(np.float64), ref[:, :n].astype(np.float64)
    snr = 10 * np.log10(max(np.mean(b ** 2), 1e-30) /
                        max(np.mean((a - b) ** 2), 1e-30))
    assert snr > 100, f"hybrid stereo SNR {snr:.1f} dB"


@requires_ref
def test_mode_switch(tmp_path):
    """SILK → CELT → SILK transitions: resampler flush, celt/silk
    state resets (opus_decode_subpacket flush_needed path)."""
    # reference-encoded CELT packets
    src = tmp_path / "celt.mkv"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "lavfi", "-i",
         "sine=frequency=500:sample_rate=48000", "-t", "0.4",
         "-c:a", "opus", "-strict", "-2", "-f", "matroska",
         str(src)], check=True)
    from ffmpeg_tpu.io.demux import open_input
    d = open_input(str(src))
    celt_pkts = []
    while True:
        try:
            celt_pkts.append(bytes(d.read_packet().data))
        except Exception:
            break
    silk_pkts = make_stream(77, 9, 1, 8)
    mixed = silk_pkts[:4] + celt_pkts[2:8] + silk_pkts[4:]
    path = mux_mkv(tmp_path, mixed, 9, 1, "mixed.mkv")
    ref = decode_ref(path, 1)
    ours = decode_ours(mixed, 9, 1)
    n = min(ref.shape[1], ours.shape[1])
    assert n > 0 and abs(ref.shape[1] - ours.shape[1]) <= 1920
    a, b = ours[:, :n].astype(np.float64), ref[:, :n].astype(np.float64)
    snr = 10 * np.log10(max(np.mean(b ** 2), 1e-30) /
                        max(np.mean((a - b) ** 2), 1e-30))
    assert snr > 60, f"mode-switch SNR {snr:.1f} dB"
