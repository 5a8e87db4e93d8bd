"""E-AC-3 crafted-stream differential tests for the decoder features
the reference's eac3 encoder never emits: the adaptive hybrid
transform (AHT: 6-block DCT + GAQ) and spectral extension (SPX).

The writer below emits syntactically valid independent frames by
mirroring the decoder's syntax (eac3dec.c / ac3dec.c) and replicating
the bit allocation to know each bin's (he)bap. The reference binary
decodes the crafted file as the oracle; our decoder must match to
float rounding."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs import ac3_tables as T
from ffmpeg_tpu.codecs import eac3_tables as E
from ffmpeg_tpu.codecs.ac3 import _calc_psd, _calc_mask, _calc_bap
from ffmpeg_tpu.codecs.bitstream import BitWriter
from ffmpeg_tpu.io import open_input
from ffmpeg_tpu.io.stream import MediaType

TOL = 3e-5

BA_DEFAULT = {"sr_code": 0, "sr_shift": 0,
              "slow_decay": T.SLOW_DECAY_TAB[2],
              "fast_decay": T.FAST_DECAY_TAB[1],
              "slow_gain": T.SLOW_GAIN_TAB[1],
              "db_per_bit": T.DB_PER_BIT_TAB[2],
              "floor": T.FLOOR_TAB[7],
              "cpl_fast_leak": 0, "cpl_slow_leak": 0}


def _write_exponents(w, rng, strategy, end_freq, absexp):
    """D15/25/45 exponent coding; returns the decoded exponent array
    (mirrors ac3dec.c decode_exponents)."""
    group_size = 3 << (strategy - 1)
    ngrps = (end_freq + group_size - 4) // group_size
    w.put(absexp, 4)
    dexps = np.zeros(280, np.int8)
    dexps[0] = absexp
    prev = absexp
    j = 1
    per = strategy + (strategy == 3)    # bins per delta
    for _ in range(ngrps):
        ds = []
        for _ in range(3):
            lo = max(0, 2 - prev)
            hi = min(4, 26 - prev)
            d = int(rng.integers(lo, hi + 1))
            prev += d - 2
            ds.append(d)
            for _ in range(per):
                dexps[j] = prev
                j += 1
        w.put(ds[0] * 25 + ds[1] * 5 + ds[2], 7)
    return dexps


def _bap_for(dexps, end_freq, snr_offset, hebap):
    psd, band_psd = _calc_psd(dexps, 0, end_freq)
    mask = _calc_mask(BA_DEFAULT, band_psd, 0, end_freq,
                      T.FAST_GAIN_TAB[4], False, None)
    tab = E.HEBAP_TAB if hebap else T.BAP_TAB
    return _calc_bap(mask, psd, 0, end_freq, snr_offset,
                     BA_DEFAULT["floor"], tab)


def _write_aht(w, rng, bap, end_freq, gaq_mode):
    """Mirror of eac3dec.c ff_eac3_decode_transform_coeffs_aht_ch."""
    w.put(gaq_mode, 2)
    end_bap = 12 if gaq_mode < 2 else 17
    gains = []
    if gaq_mode in (1, 2):
        for bin_ in range(end_freq):
            if 7 < bap[bin_] < end_bap:
                bit = int(rng.integers(0, 2))
                w.put(bit, 1)
                gains.append(bit << (gaq_mode - 1))
    elif gaq_mode == 3:
        gc = 2
        pend = []
        for bin_ in range(end_freq):
            if 7 < bap[bin_] < 17:
                if gc == 2:
                    g = [int(rng.integers(0, 3)) for _ in range(3)]
                    w.put(g[0] * 9 + g[1] * 3 + g[2], 5)
                    gains.extend(g)
                    gc = 0
                else:
                    gc += 1
        del pend
    gs = 0
    for bin_ in range(end_freq):
        hebap = int(bap[bin_])
        bits = E.BITS_VS_HEBAP[hebap]
        if hebap == 0:
            continue
        if hebap < 8:
            w.put(int(rng.integers(0, 1 << bits)), bits)
            continue
        if gaq_mode != 0 and hebap < end_bap:
            log_gain = gains[gs]
            gs += 1
        else:
            log_gain = 0
        gbits = bits - log_gain
        for _ in range(6):
            if log_gain and rng.random() < 0.3:
                # large-mantissa escape
                w.put_signed(-(1 << (gbits - 1)), gbits)
                mbits = bits - (2 - log_gain)
                w.put_signed(int(rng.integers(-(1 << (mbits - 1)),
                                              1 << (mbits - 1))),
                             mbits)
            else:
                lo = -(1 << (gbits - 1)) + (1 if log_gain else 0)
                v = int(rng.integers(lo, 1 << (gbits - 1)))
                w.put_signed(v, gbits)


def _write_mantissas(w, rng, bap, end_freq, m):
    """Mirror of the grouped-mantissa state machine (ac3dec.c:397)."""
    for bin_ in range(end_freq):
        bp = int(bap[bin_])
        if bp == 0:
            continue
        if bp == 1:
            if m["b1"]:
                m["b1"] -= 1
            else:
                w.put(int(rng.integers(0, 27)), 5)
                m["b1"] = 2
        elif bp == 2:
            if m["b2"]:
                m["b2"] -= 1
            else:
                w.put(int(rng.integers(0, 125)), 7)
                m["b2"] = 2
        elif bp == 3:
            w.put(int(rng.integers(0, 7)), 3)
        elif bp == 4:
            if m["b4"]:
                m["b4"] = 0
            else:
                w.put(int(rng.integers(0, 121)), 7)
                m["b4"] = 1
        elif bp == 5:
            w.put(int(rng.integers(0, 15)), 4)
        else:
            n = T.QUANTIZATION_TAB[bp]
            w.put(int(rng.integers(0, 1 << n)), n)


def _crc16_ansi_table():
    tab = []
    for i in range(256):
        c = i << 24
        for _ in range(8):
            mask = 0xFFFFFFFF if c & 0x80000000 else 0
            c = ((c << 1) ^ ((0x8005 << 16) & mask)) & 0xFFFFFFFF
        tab.append(int.from_bytes(c.to_bytes(4, "big"), "little"))
    return tab


_CRC_TAB = _crc16_ansi_table()


def _crc16(data):
    """av_crc(AV_CRC_16_ANSI, 0, ...) (libavutil/crc.c)."""
    crc = 0
    for byte in data:
        crc = _CRC_TAB[(crc & 0xFF) ^ byte] ^ (crc >> 8)
    return crc


def _finish_frame(w):
    w.align()
    data = bytearray(w.bytes())
    data += b"\x00\x00"                 # crc2 slot
    if len(data) & 1:
        data.insert(len(data) - 2, 0)
    fsz = len(data) // 2 - 1
    # frame size field sits at bits 21..31 (sync16 + type2 + id3)
    data[2] = (data[2] & 0xF8) | ((fsz >> 8) & 7)
    data[3] = fsz & 0xFF
    # crc2 over [2, size-2), byte-swapped (ac3enc.c output_frame_end)
    crc2 = _crc16(data[2:-2])
    data[-2] = crc2 & 0xFF              # bswap16 + WB16 == LE store
    data[-1] = crc2 >> 8
    return bytes(data)


def craft_aht_frame(seed, gaq_mode, csnr=20, fsnr=8, bwcode=40):
    """Mono, 6 blocks, AHT on, chosen GAQ mode."""
    rng = np.random.default_rng(seed)
    w = BitWriter()
    w.put(0x0B77, 16)
    w.put(0, 2)                 # independent
    w.put(0, 3)                 # substream 0
    w.put(0, 11)                # frame size (patched)
    w.put(0, 2)                 # 48 kHz
    w.put(3, 2)                 # 6 blocks
    w.put(1, 3)                 # mono
    w.put(0, 1)                 # no LFE
    w.put(16, 5)                # bsid
    w.put(31, 5)                # dialnorm
    w.put(0, 1)                 # no compr
    w.put(0, 1)                 # no mixing metadata
    w.put(0, 1)                 # no info metadata
    w.put(0, 1)                 # no additional bsi
    # audio frame header
    w.put(1, 1)                 # AC-3 exponent strategy syntax
    w.put(1, 1)                 # AHT enabled
    w.put(0, 2)                 # snr offset strategy 0 (per frame)
    w.put(0, 1)                 # no transient proc
    w.put(0, 1)                 # no block switch syntax
    w.put(0, 1)                 # no dither syntax (dither always on)
    w.put(0, 1)                 # no bit allocation syntax
    w.put(0, 1)                 # no fast gain syntax
    w.put(0, 1)                 # no dba syntax
    w.put(0, 1)                 # no skip syntax
    w.put(0, 1)                 # no spx attenuation data
    # exponent strategies: D15 then reuse (AHT requirement)
    w.put(1, 2)
    for _ in range(5):
        w.put(0, 2)
    w.put(0, 5)                 # converter exponent strategy ch1
    w.put(1, 1)                 # channel_uses_aht[1]
    w.put(csnr, 6)
    w.put(fsnr, 4)
    w.put(0, 1)                 # no block start info
    snr_offset = (((csnr - 15) << 4) + fsnr) << 2
    end_freq = bwcode * 3 + 73
    for blk in range(6):
        w.put(0, 1)             # dynrnge
        if blk == 0:
            w.put(0, 1)         # spxinu = 0
        else:
            w.put(0, 1)         # spxstre = 0 (reuse)
        if blk == 0:
            w.put(bwcode, 6)
            dexps = _write_exponents(w, rng, 1, end_freq, 9)
            w.put(0, 2)         # gainrng
        w.put(0, 1)             # converter snr offset flag
        if blk == 0:
            bap = _bap_for(dexps, end_freq, snr_offset, hebap=True)
            _write_aht(w, rng, bap, end_freq, gaq_mode)
    return _finish_frame(w)


def craft_spx_frame(seed, csnr=18, fsnr=4, atten=True, recoord=False):
    """Stereo, 6 blocks, SPX on both channels, no coupling."""
    rng = np.random.default_rng(seed)
    w = BitWriter()
    w.put(0x0B77, 16)
    w.put(0, 2)
    w.put(0, 3)
    w.put(0, 11)
    w.put(0, 2)                 # 48 kHz
    w.put(3, 2)                 # 6 blocks
    w.put(2, 3)                 # stereo
    w.put(0, 1)                 # no LFE
    w.put(16, 5)
    w.put(31, 5)
    w.put(0, 1)
    w.put(0, 1)                 # no mixing metadata
    w.put(0, 1)                 # no info metadata
    w.put(0, 1)                 # no additional bsi
    w.put(1, 1)                 # AC-3 exponent strategy syntax
    w.put(0, 1)                 # AHT off
    w.put(0, 2)                 # snr offset strategy 0
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 1)                 # dither always on
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 1)
    w.put(1, 1)                 # spx attenuation data present
    # coupling use flags: blk0 cplinu=0, then 5x no new strategy
    w.put(0, 1)
    for _ in range(5):
        w.put(0, 1)
    # exponent strategies: both channels D15 at blk0, reuse after
    strategies = [[1, 0, 0, 2, 0, 0], [1, 0, 0, 2, 0, 0]]
    for blk in range(6):
        for ch in (0, 1):
            w.put(strategies[ch][blk], 2)
    for _ in range(2):
        w.put(0, 5)             # converter exponent strategies
    w.put(csnr, 6)
    w.put(fsnr, 4)
    # spx attenuation codes
    for _ in range(2):
        if atten:
            w.put(1, 1)
            w.put(int(rng.integers(0, 32)), 5)
        else:
            w.put(0, 1)
    w.put(0, 1)                 # no block start info
    snr_offset = (((csnr - 15) << 4) + fsnr) << 2
    # SPX ranges: dst 25, src subband 3 → bin 61, end subband 9 → 133
    src_start = 61
    # band sizes from the default band structure over subbands 3..9
    n_sub = 9 - 3
    sizes = [12]
    for sb in range(1, n_sub):
        if E.DEFAULT_SPX_BAND_STRUCT[3 + sb]:
            sizes[-1] += 12
        else:
            sizes.append(12)
    end_freq = src_start
    dexps = [None, None]
    m = None
    for blk in range(6):
        w.put(0, 1)             # dynrnge
        if blk == 0:
            w.put(1, 1)         # spxinu
            w.put(3, 2)         # both channels use spx
            w.put(0, 2)         # dst start code → bin 25
            w.put(1, 3)         # start subband 3
            w.put(3, 3)         # end subband 8 → wrap → 9
            w.put(0, 1)         # default spx band structure
        else:
            w.put(0, 1)         # spxstre = 0
        # spx coordinates
        for ch in (0, 1):
            if blk == 0 or (recoord and blk == 3):
                if blk != 0:
                    w.put(1, 1)     # new coords
                w.put(int(rng.integers(0, 32)), 5)   # spx blend
                w.put(int(rng.integers(0, 4)), 2)    # master
                for _ in range(len(sizes)):
                    w.put(int(rng.integers(0, 15)), 4)
                    w.put(int(rng.integers(0, 4)), 2)
            else:
                w.put(0, 1)         # reuse coords
        # rematrixing: blk0 implicit new strategy (no bit)
        nbands = 4 - 1          # spx_src_start 61 <= 61 → one less
        if blk == 0:
            for _ in range(nbands):
                w.put(int(rng.integers(0, 2)), 1)
        else:
            w.put(0, 1)         # reuse rematrix flags
        # bandwidth/exponents when strategy != reuse
        for ch in (0, 1):
            if strategies[ch][blk]:
                # spx channel: no bandwidth code
                dexps[ch] = _write_exponents(w, rng,
                                             strategies[ch][blk],
                                             end_freq, 8)
                w.put(0, 2)     # gainrng
        w.put(0, 1)             # converter snr offset flag
        # mantissas
        m = {"b1": 0, "b2": 0, "b4": 0}
        for ch in (0, 1):
            bap = _bap_for(dexps[ch], end_freq, snr_offset,
                           hebap=False)
            _write_mantissas(w, rng, bap, end_freq, m)
    return _finish_frame(w)


def _ref_decode(path):
    out = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(path),
         "-c:a", "pcm_f32le", "-f", "wav", "-"],
        check=True, capture_output=True).stdout
    pos = out.find(b"data")
    assert pos > 0
    return np.frombuffer(out[pos + 8:], "<f4")


def _our_decode(path):
    d = open_input(str(path))
    st = [s for s in d.streams
          if s.codecpar.codec_type == MediaType.AUDIO][0]
    dec = CodecContext.open_decoder(st.codecpar)
    frames = dec.decode_all([p for p in d.packets()
                             if p.stream_index == st.index])
    assert frames
    pcm = np.concatenate([np.stack([np.asarray(pl) for pl in f.planes])
                          for f in frames], axis=1)
    return pcm.T.reshape(-1)


def _run(tmp_path, frames, name):
    p = tmp_path / name
    p.write_bytes(b"".join(frames))
    ref = _ref_decode(p)
    ours = _our_decode(p)
    n = min(len(ref), len(ours))
    assert n >= len(frames) * 1536 // 2
    np.testing.assert_allclose(ours[:n], ref[:n], atol=TOL)


@requires_ref
@pytest.mark.parametrize("gaq", [0, 1, 2, 3])
def test_eac3_aht_gaq(tmp_path, gaq):
    frames = [craft_aht_frame(100 * gaq + i, gaq) for i in range(4)]
    _run(tmp_path, frames, f"aht{gaq}.eac3")


@requires_ref
def test_eac3_aht_snr_sweep(tmp_path):
    """Different SNR offsets move bins across the hebap range."""
    frames = [craft_aht_frame(7 + i, 3, csnr=10 + 8 * i,
                              fsnr=(3 * i) & 15, bwcode=20 + 10 * i)
              for i in range(4)]
    _run(tmp_path, frames, "ahtsnr.eac3")


@requires_ref
def test_eac3_spx(tmp_path):
    frames = [craft_spx_frame(50 + i) for i in range(4)]
    _run(tmp_path, frames, "spx.eac3")


@requires_ref
def test_eac3_spx_no_atten_recoord(tmp_path):
    frames = [craft_spx_frame(90 + i, csnr=24, atten=False,
                              recoord=True) for i in range(4)]
    _run(tmp_path, frames, "spx2.eac3")
