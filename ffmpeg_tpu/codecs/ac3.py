"""AC-3 (ATSC A/52) decoder (reference: libavcodec/ac3dec.c,
ac3_parser.c:288, ac3.c:180 bit allocation).

Host/device split follows the framework's audio pattern (see mp3.py):
bit allocation, exponent/mantissa entropy decode and (un)coupling run
on the host; the synthesis filterbank (256-pt half-IMDCT as an MXU
matmul + KBD window overlap-add) runs batched on device via
ops/ac3fb.py.

Scope: plain AC-3 (bsid ≤ 10), all channel modes incl. LFE, channel
coupling, stereo rematrixing, dynamic range gains and dithered zero-bit
mantissas (replicating the reference's lagged-Fibonacci dither PRNG so
differential tests match to float rounding). E-AC-3 (bsid 16) is a
later round."""

from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np

from ..core.frame import Frame
from ..core.packet import Packet
from ..io.stream import MediaType
from ..utils.error import InvalidData, NotSupported
from ..utils.rational import Rational
from . import ac3_tables as T
from .bitstream import BitReader
from .codec import Codec, register_decoder

EXP_REUSE, EXP_D15, EXP_D25, EXP_D45 = 0, 1, 2, 3
CPL = 0                     # coupling pseudo-channel index


class _Lfg:
    """av_lfg-compatible lagged Fibonacci PRNG (libavutil/lfg.c:32):
    state[8:] from iterated MD5 of the seed, x[n] = x[n-24] + x[n-55]."""

    def __init__(self, seed: int = 0):
        self.state = [0] * 64
        tmp = bytearray(16)          # digest feeds back into the buffer
        for i in range(8, 64, 4):
            tmp[0:4] = seed.to_bytes(4, "little")
            tmp[4] = i
            tmp[:] = hashlib.md5(bytes(tmp)).digest()
            for j in range(4):
                self.state[i + j] = int.from_bytes(tmp[4 * j:4 * j + 4],
                                                   "little")
        self.index = 0

    def get(self) -> int:
        s = self.state
        i = self.index
        v = (s[(i - 24) & 63] + s[(i - 55) & 63]) & 0xFFFFFFFF
        s[i & 63] = v
        self.index = i + 1
        return v


def _calc_psd(exps, start, end):
    """Exponent → PSD mapping + log-add band integration (A/52 §7.2.2.1,
    reference ac3.c:180 ff_ac3_bit_alloc_calc_psd)."""
    psd = np.zeros(256, np.int32)
    psd[start:end] = 3072 - (exps[start:end].astype(np.int32) << 7)
    band_psd = np.zeros(50, np.int32)
    b = start
    band = T.BIN_TO_BAND_TAB[start]
    while True:
        v = int(psd[b])
        b += 1
        band_end = min(T.BAND_START_TAB[band + 1], end)
        while b < band_end:
            mx = max(v, int(psd[b]))
            adr = min(mx - ((v + int(psd[b]) + 1) >> 1), 255)
            v = mx + T.LOG_ADD_TAB[adr]
            b += 1
        band_psd[band] = v
        band += 1
        if end <= T.BAND_START_TAB[band]:
            break
    return psd, band_psd


def _lowcomp1(a, b0, b1, c):
    if b0 + 256 == b1:
        return c
    if b0 > b1:
        return max(a - 64, 0)
    return a


def _lowcomp(a, b0, b1, bin_):
    if bin_ < 7:
        return _lowcomp1(a, b0, b1, 384)
    if bin_ < 20:
        return _lowcomp1(a, b0, b1, 320)
    return max(a - 128, 0)


def _calc_mask(ba, band_psd, start, end, fast_gain, is_lfe, dba):
    """Excitation + masking curve (A/52 §7.2.2.2-3, ac3.c:204)."""
    excite = np.zeros(50, np.int32)
    band_start = T.BIN_TO_BAND_TAB[start]
    band_end = T.BIN_TO_BAND_TAB[end - 1] + 1
    fastleak = slowleak = 0
    if band_start == 0:
        lowcomp = _lowcomp1(0, band_psd[0], band_psd[1], 384)
        excite[0] = band_psd[0] - fast_gain - lowcomp
        lowcomp = _lowcomp1(lowcomp, band_psd[1], band_psd[2], 384)
        excite[1] = band_psd[1] - fast_gain - lowcomp
        begin = 7
        for band in range(2, 7):
            if not (is_lfe and band == 6):
                lowcomp = _lowcomp1(lowcomp, band_psd[band],
                                    band_psd[band + 1], 384)
            fastleak = band_psd[band] - fast_gain
            slowleak = band_psd[band] - ba["slow_gain"]
            excite[band] = fastleak - lowcomp
            if not (is_lfe and band == 6):
                if band_psd[band] <= band_psd[band + 1]:
                    begin = band + 1
                    break
        for band in range(begin, min(band_end, 22)):
            if not (is_lfe and band == 6):
                lowcomp = _lowcomp(lowcomp, band_psd[band],
                                   band_psd[band + 1], band)
            fastleak = max(fastleak - ba["fast_decay"],
                           band_psd[band] - fast_gain)
            slowleak = max(slowleak - ba["slow_decay"],
                           band_psd[band] - ba["slow_gain"])
            excite[band] = max(fastleak - lowcomp, slowleak)
        begin = 22
    else:                       # coupling channel
        begin = band_start
        fastleak = (ba["cpl_fast_leak"] << 8) + 768
        slowleak = (ba["cpl_slow_leak"] << 8) + 768
    for band in range(begin, band_end):
        fastleak = max(fastleak - ba["fast_decay"],
                       band_psd[band] - fast_gain)
        slowleak = max(slowleak - ba["slow_decay"],
                       band_psd[band] - ba["slow_gain"])
        excite[band] = max(fastleak, slowleak)

    mask = np.zeros(50, np.int32)
    for band in range(band_start, band_end):
        tmp = ba["db_per_bit"] - band_psd[band]
        if tmp > 0:
            excite[band] += tmp >> 2
        mask[band] = max(T.HEARING_THRESHOLD_TAB[band >> ba["sr_shift"]]
                         [ba["sr_code"]], excite[band])
    if dba is not None:
        band = band_start
        for off, ln, val in dba:
            band += off
            if band >= 50 or ln > 50 - band:
                raise InvalidData("ac3: bad delta bit allocation")
            delta = (val - 3) * 128 if val >= 4 else (val - 4) * 128
            for _ in range(ln):
                mask[band] += delta
                band += 1
    return mask


def _calc_bap(mask, psd, start, end, snr_offset, floor):
    """Masking → bit allocation pointers (ac3dsp.c bit_alloc_calc_bap)."""
    bap = np.zeros(256, np.uint8)
    if snr_offset == -960:
        return bap
    b = start
    band = T.BIN_TO_BAND_TAB[start]
    while True:
        m = (max(int(mask[band]) - snr_offset - floor, 0) & 0x1FE0) + floor
        band += 1
        band_end = min(T.BAND_START_TAB[band], end)
        while b < band_end:
            addr = min(max((int(psd[b]) - m) >> 5, 0), 63)
            bap[b] = T.BAP_TAB[addr]
            b += 1
        if end <= band_end:
            break
    return bap


@register_decoder
class Ac3Decoder(Codec):
    codec_id = "ac3"
    codec_type = MediaType.AUDIO

    def __init__(self, par, options=None):
        super().__init__(par, options)
        self._dith = _Lfg(0)
        self._delay = None          # (channels, 128) overlap state
        self._pts = None

    # ------------------------------------------------------------------
    def decode(self, pkt: Optional[Packet]) -> List[Frame]:
        if pkt is None or not pkt.data:
            return []
        data = pkt.data
        frames = []
        pos = 0
        while pos + 8 <= len(data):
            if data[pos:pos + 2] != b"\x0b\x77":
                pos += 1
                continue
            f = self._decode_frame(data[pos:], pkt)
            if f is None:
                break
            frame, size = f
            frames.append(frame)
            pos += size
        return frames

    def _decode_frame(self, buf, pkt):
        b = BitReader(buf)
        b.skip(16)                  # sync word
        b.skip(16)                  # crc1
        sr_code = b.get(2)
        if sr_code == 3:
            raise InvalidData("ac3: bad sample rate code")
        frame_size_code = b.get(6)
        if frame_size_code > 37:
            raise InvalidData("ac3: bad frame size code")
        bsid = b.get(5)
        if bsid > 10:
            raise NotSupported("ac3: E-AC-3 (bsid>10) not yet supported")
        sr_shift = max(bsid, 8) - 8
        sample_rate = T.SAMPLE_RATE_TAB[sr_code] >> sr_shift
        frame_size = T.FRAME_SIZE_TAB[frame_size_code][sr_code] * 2
        if len(buf) < frame_size:
            raise InvalidData("ac3: truncated frame")
        b.skip(3)                   # bsmod
        acmod = b.get(3)
        if acmod == 2:
            b.skip(2)               # dsurmod
        else:
            if (acmod & 1) and acmod != 1:
                b.skip(2)           # cmixlev
            if acmod & 4:
                b.skip(2)           # surmixlev
        lfe_on = b.get(1)
        fbw = T.CHANNELS_TAB[acmod]
        channels = fbw + lfe_on
        lfe_ch = fbw + 1            # 1-based channel index of the LFE
        # rest of BSI (A/52 §5.4.2; ac3_parser.c:240)
        for _ in range(2 if acmod == 0 else 1):
            b.skip(5)               # dialnorm
            if b.get(1):
                b.skip(8)           # compr
            if b.get(1):
                b.skip(8)           # langcod
            if b.get(1):
                b.skip(7)           # audio production info
        b.skip(2)                   # copyright + original
        if bsid != 6:
            if b.get(1):
                b.skip(14)          # timecod1
            if b.get(1):
                b.skip(14)          # timecod2
        else:
            if b.get(1):
                b.skip(14)
            if b.get(1):
                b.skip(14)
        if b.get(1):                # addbsie
            n = b.get(6)
            b.skip(8 * (n + 1))

        st = _FrameState(channels, fbw, lfe_on, acmod, sr_code, sr_shift)
        pcm = np.zeros((channels, 6 * 256), np.float32)
        if self._delay is None or self._delay.shape[0] != channels:
            self._delay = np.zeros((channels, 128), np.float32)
        for blk in range(6):
            self._decode_block(b, st, blk, pcm[:, blk * 256:(blk + 1) * 256])

        # channel order: AC-3 order matches SMPTE for mono/stereo; the
        # LFE follows the fbw channels (full 5.1 remap is a TODO)
        from ..formats.channel_layout import default_layout
        fr = Frame.audio(pcm, sample_rate, "fltp",
                         default_layout(channels), pts=pkt.pts,
                         time_base=pkt.time_base or
                         Rational(1, sample_rate))
        fr.duration = 6 * 256
        return fr, frame_size

    # ------------------------------------------------------------------
    def _decode_block(self, b, st, blk, out):
        fbw = st.fbw
        # block switch + dither flags
        for ch in range(1, fbw + 1):
            st.block_switch[ch] = b.get(1)
        for ch in range(1, fbw + 1):
            st.dither_flag[ch] = b.get(1)
        # dynamic range
        for i in range(2 if st.acmod == 0 else 1):
            if b.get(1):
                st.dynrng[i] = T.DYNAMIC_RANGE_TAB[b.get(8)]
            elif blk == 0:
                st.dynrng[i] = 1.0
        # coupling strategy
        if b.get(1):
            st.cpl_in_use = b.get(1)
            if st.cpl_in_use:
                if st.acmod in (0, 1):
                    raise InvalidData("ac3: coupling in mono")
                for ch in range(1, fbw + 1):
                    st.channel_in_cpl[ch] = b.get(1)
                if st.acmod == 2:
                    st.phase_flags_in_use = b.get(1)
                cpl_start = b.get(4)
                cpl_end = b.get(4) + 3
                if cpl_start >= cpl_end:
                    raise InvalidData("ac3: bad coupling range")
                st.start_freq[CPL] = cpl_start * 12 + 37
                st.end_freq[CPL] = cpl_end * 12 + 37
                # band structure (1 bit per subband boundary)
                nsub = cpl_end - cpl_start
                struct = [b.get(1) for _ in range(nsub - 1)]
                sizes = [12]
                for s_ in struct:
                    if s_:
                        sizes[-1] += 12
                    else:
                        sizes.append(12)
                st.cpl_band_sizes = sizes
            else:
                for ch in range(1, fbw + 1):
                    st.channel_in_cpl[ch] = 0
                    st.first_cpl_coords[ch] = 1
                st.phase_flags_in_use = 0
        elif blk == 0:
            raise InvalidData("ac3: coupling strategy missing in block 0")
        # coupling coordinates
        if st.cpl_in_use:
            coords_exist = False
            for ch in range(1, fbw + 1):
                if st.channel_in_cpl[ch]:
                    if b.get(1):
                        st.first_cpl_coords[ch] = 0
                        coords_exist = True
                        master = 3 * b.get(2)
                        nb = len(st.cpl_band_sizes)
                        for bnd in range(nb):
                            cexp = b.get(4)
                            cmant = b.get(4)
                            if cexp == 15:
                                v = cmant << 22
                            else:
                                v = (cmant + 16) << 21
                            st.cpl_coords[ch][bnd] = v >> (cexp + master)
                    elif blk == 0:
                        raise InvalidData("ac3: cpl coords missing")
                else:
                    st.first_cpl_coords[ch] = 1
            if st.acmod == 2 and coords_exist:
                nb = len(st.cpl_band_sizes)
                st.phase_flags = [b.get(1) if st.phase_flags_in_use else 0
                                  for _ in range(nb)]
        # rematrixing
        if st.acmod == 2:
            if b.get(1):
                nbands = 4
                if st.cpl_in_use and st.start_freq[CPL] <= 61:
                    nbands -= 1 + (st.start_freq[CPL] == 37)
                st.num_rematrixing_bands = nbands
                st.rematrixing_flags = [b.get(1) for _ in range(nbands)]
            elif blk == 0:
                st.num_rematrixing_bands = 0
        # exponent strategies
        nch = st.channels
        lfe_ch = st.lfe_ch
        first = CPL if st.cpl_in_use else 1
        exp_strategy = {}
        for ch in range(first, nch + 1):
            exp_strategy[ch] = b.get(1 if ch == lfe_ch and st.lfe_on
                                     else 2)
        # channel bandwidth
        for ch in range(1, fbw + 1):
            st.start_freq[ch] = 0
            if exp_strategy[ch] != EXP_REUSE:
                if st.channel_in_cpl[ch]:
                    st.end_freq[ch] = st.start_freq[CPL]
                else:
                    bw = b.get(6)
                    if bw > 60:
                        raise InvalidData("ac3: bad bandwidth code")
                    st.end_freq[ch] = bw * 3 + 73
                gs = 3 << (exp_strategy[ch] - 1)
                st.num_exp_groups[ch] = (st.end_freq[ch] + gs - 4) // gs
        if st.cpl_in_use and exp_strategy[CPL] != EXP_REUSE:
            st.num_exp_groups[CPL] = \
                (st.end_freq[CPL] - st.start_freq[CPL]) // \
                (3 << (exp_strategy[CPL] - 1))
        if st.lfe_on:
            st.start_freq[lfe_ch] = 0
            st.end_freq[lfe_ch] = 7
            st.num_exp_groups[lfe_ch] = 2
        # exponents
        for ch in range(first, nch + 1):
            if exp_strategy[ch] != EXP_REUSE:
                absexp = b.get(4) << (1 if ch == CPL else 0)
                st.dexps[ch][0] = absexp
                self._decode_exponents(
                    b, exp_strategy[ch], st.num_exp_groups[ch], absexp,
                    st.dexps[ch],
                    st.start_freq[ch] + (1 if ch != CPL else 0))
                if ch != CPL and ch != (lfe_ch if st.lfe_on else -1):
                    b.skip(2)       # gainrng
        # bit allocation info
        if b.get(1):
            st.ba["slow_decay"] = T.SLOW_DECAY_TAB[b.get(2)] >> st.sr_shift
            st.ba["fast_decay"] = T.FAST_DECAY_TAB[b.get(2)] >> st.sr_shift
            st.ba["slow_gain"] = T.SLOW_GAIN_TAB[b.get(2)]
            st.ba["db_per_bit"] = T.DB_PER_BIT_TAB[b.get(2)]
            st.ba["floor"] = T.FLOOR_TAB[b.get(3)]
        elif blk == 0:
            raise InvalidData("ac3: bit allocation info missing")
        # snr offsets
        if b.get(1):
            csnr = (b.get(6) - 15) << 4
            for ch in range(first, nch + 1):
                st.snr_offset[ch] = (csnr + b.get(4)) << 2
                st.fast_gain[ch] = T.FAST_GAIN_TAB[b.get(3)]
        elif blk == 0:
            raise InvalidData("ac3: snr offsets missing in block 0")
        # coupling leak
        if st.cpl_in_use:
            if b.get(1):
                st.ba["cpl_fast_leak"] = b.get(3)
                st.ba["cpl_slow_leak"] = b.get(3)
            elif blk == 0:
                raise InvalidData("ac3: coupling leak missing")
        # delta bit allocation
        if b.get(1):
            for ch in range(first, fbw + 1):
                st.dba_mode[ch] = b.get(2)
                if st.dba_mode[ch] == 3:
                    raise InvalidData("ac3: reserved dba mode")
            for ch in range(first, fbw + 1):
                if st.dba_mode[ch] == 2:        # DBA_NEW
                    nseg = b.get(3) + 1
                    st.dba[ch] = [(b.get(5), b.get(4), b.get(3))
                                  for _ in range(nseg)]
        elif blk == 0:
            for ch in range(0, nch + 1):
                st.dba_mode[ch] = 0
        # bit allocation (recomputed every block; the reference's staged
        # caching is a CPU optimization with identical results)
        for ch in range(first, nch + 1):
            psd, band_psd = _calc_psd(st.dexps[ch], st.start_freq[ch],
                                      st.end_freq[ch])
            dba = st.dba[ch] if st.dba_mode[ch] in (1, 2) else None
            mask = _calc_mask(st.ba, band_psd, st.start_freq[ch],
                              st.end_freq[ch], st.fast_gain[ch],
                              ch == lfe_ch and st.lfe_on, dba)
            st.bap[ch] = _calc_bap(mask, psd, st.start_freq[ch],
                                   st.end_freq[ch], st.snr_offset[ch],
                                   st.ba["floor"])
        # skip field
        if b.get(1):
            b.skip(8 * b.get(9))
        # mantissas
        coeffs = np.zeros((nch + 1, 256), np.int64)
        m = {"b1": 0, "b2": 0, "b4": 0,
             "b1v": [0, 0], "b2v": [0, 0], "b4v": 0}
        got_cpl = False
        for ch in range(1, nch + 1):
            self._decode_mantissas(b, st, ch, coeffs[ch], m)
            if st.channel_in_cpl.get(ch):
                if not got_cpl:
                    self._decode_mantissas(b, st, CPL, coeffs[CPL], m)
                    self._uncouple(st, coeffs)
                    got_cpl = True
        # zero dithered coupling bins for non-dithering channels
        for ch in range(1, fbw + 1):
            if st.channel_in_cpl.get(ch) and not st.dither_flag[ch]:
                for i in range(st.start_freq[CPL], st.end_freq[CPL]):
                    if st.bap[CPL][i] == 0:
                        coeffs[ch][i] = 0
        # rematrixing
        if st.acmod == 2:
            end = min(st.end_freq[1], st.end_freq[2])
            for bnd in range(st.num_rematrixing_bands):
                if st.rematrixing_flags[bnd]:
                    lo = T.REMATRIX_BAND_TAB[bnd]
                    hi = min(end, T.REMATRIX_BAND_TAB[bnd + 1])
                    t0 = coeffs[1][lo:hi].copy()
                    coeffs[1][lo:hi] = t0 + coeffs[2][lo:hi]
                    coeffs[2][lo:hi] = t0 - coeffs[2][lo:hi]
        # gain + filterbank
        from ..ops import ac3fb
        for ch in range(1, nch + 1):
            gain = st.dynrng[2 - ch if st.acmod == 0 and ch <= 2 else 0]
            xf = coeffs[ch].astype(np.float32) * np.float32(
                gain / 4194304.0)
            d = self._delay[ch - 1]
            if ch != st.lfe_ch or not st.lfe_on:
                bswitch = st.block_switch[ch]
            else:
                bswitch = 0
            if bswitch:
                h1 = ac3fb.imdct_half(xf[0::2])
                h2 = ac3fb.imdct_half(xf[1::2])
                out[ch - 1] = ac3fb.overlap_window(d, h1)
                self._delay[ch - 1] = h2
            else:
                h = ac3fb.imdct_half(xf)
                out[ch - 1] = ac3fb.overlap_window(d, h[:128])
                self._delay[ch - 1] = h[128:]

    @staticmethod
    def _decode_exponents(b, strategy, ngrps, absexp, dexps, start):
        group_size = strategy + (strategy == EXP_D45)
        dexp = []
        for _ in range(ngrps):
            v = b.get(7)
            if v >= 125:
                raise InvalidData("ac3: bad exponent group")
            dexp.extend(T.UNGROUP_3_IN_7[v])
        prev = absexp
        j = start
        for d in dexp:
            prev += d - 2
            if not 0 <= prev <= 24:
                raise InvalidData("ac3: exponent out of range")
            for _ in range(group_size):
                dexps[j] = prev
                j += 1

    def _decode_mantissas(self, b, st, ch, coeffs, m):
        """A/52 §7.3 mantissa quantization (ac3dec.c:395)."""
        dither = (ch == CPL) or st.dither_flag[ch]
        exps = st.dexps[ch]
        bap = st.bap[ch]
        for freq in range(st.start_freq[ch], st.end_freq[ch]):
            bp = bap[freq]
            if bp == 0:
                if dither:
                    mant = (((self._dith.get() >> 8) * 181) >> 8) - 5931008
                else:
                    mant = 0
            elif bp == 1:
                if m["b1"]:
                    m["b1"] -= 1
                    mant = m["b1v"][m["b1"]]
                else:
                    v = T.BAP1_MANTISSAS[b.get(5)]
                    mant, m["b1v"][1], m["b1v"][0] = v[0], v[1], v[2]
                    m["b1"] = 2
            elif bp == 2:
                if m["b2"]:
                    m["b2"] -= 1
                    mant = m["b2v"][m["b2"]]
                else:
                    v = T.BAP2_MANTISSAS[b.get(7)]
                    mant, m["b2v"][1], m["b2v"][0] = v[0], v[1], v[2]
                    m["b2"] = 2
            elif bp == 3:
                mant = T.BAP3_MANTISSAS[b.get(3)]
            elif bp == 4:
                if m["b4"]:
                    m["b4"] = 0
                    mant = m["b4v"]
                else:
                    v = T.BAP4_MANTISSAS[b.get(7)]
                    mant, m["b4v"] = v[0], v[1]
                    m["b4"] = 1
            elif bp == 5:
                mant = T.BAP5_MANTISSAS[b.get(4)]
            else:
                nbits = T.QUANTIZATION_TAB[bp]
                mant = b.get_signed(nbits) << (24 - nbits)
            # arithmetic right shift, same as the reference's C shift
            coeffs[freq] = mant >> int(exps[freq])

    @staticmethod
    def _uncouple(st, coeffs):
        """Reconstruct coupled channels (A/52 §7.4.3, ac3dec.c:355)."""
        bin_ = st.start_freq[CPL]
        for band, size in enumerate(st.cpl_band_sizes):
            band_start, band_end = bin_, bin_ + size
            for ch in range(1, st.fbw + 1):
                if st.channel_in_cpl.get(ch):
                    coord = st.cpl_coords[ch][band] << 5
                    for i in range(band_start, band_end):
                        v = (int(coeffs[CPL][i]) * 16 * coord)
                        coeffs[ch][i] = v >> 32
                    if ch == 2 and st.phase_flags[band]:
                        coeffs[2][band_start:band_end] = \
                            -coeffs[2][band_start:band_end]
            bin_ = band_end


class _FrameState:
    def __init__(self, channels, fbw, lfe_on, acmod, sr_code, sr_shift):
        self.channels = channels
        self.fbw = fbw
        self.lfe_on = lfe_on
        self.lfe_ch = fbw + 1
        self.acmod = acmod
        self.sr_shift = sr_shift
        self.block_switch = [0] * (channels + 1)
        self.dither_flag = [0] * (channels + 1)
        self.dynrng = [1.0, 1.0]
        self.cpl_in_use = 0
        self.channel_in_cpl = {ch: 0 for ch in range(1, fbw + 1)}
        self.first_cpl_coords = {ch: 1 for ch in range(1, fbw + 1)}
        self.phase_flags_in_use = 0
        self.phase_flags = [0] * 18
        self.cpl_band_sizes = []
        self.cpl_coords = {ch: [0] * 18 for ch in range(1, fbw + 1)}
        self.num_rematrixing_bands = 0
        self.rematrixing_flags = []
        self.start_freq = {CPL: 0}
        self.end_freq = {CPL: 0}
        self.num_exp_groups = {}
        self.dexps = {ch: np.zeros(256, np.int8)
                      for ch in range(0, channels + 1)}
        self.bap = {ch: np.zeros(256, np.uint8)
                    for ch in range(0, channels + 1)}
        self.snr_offset = {ch: 0 for ch in range(0, channels + 1)}
        self.fast_gain = {ch: 0 for ch in range(0, channels + 1)}
        self.dba_mode = {ch: 0 for ch in range(0, channels + 1)}
        self.dba = {ch: None for ch in range(0, channels + 1)}
        self.ba = {"sr_code": sr_code, "sr_shift": sr_shift,
                   "slow_decay": 0, "fast_decay": 0, "slow_gain": 0,
                   "db_per_bit": 0, "floor": 0,
                   "cpl_fast_leak": 0, "cpl_slow_leak": 0}
