"""MP3 Layer III decoder tests (codecs/mp3.py + ops/mp3fb.py).

No MP3 encoder exists in this environment (the reference has no native
one), so known-answer frames are crafted bit-by-bit from the ISO Huffman
tables and decoded by BOTH our decoder and the reference binary — the
PCM must match."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs import mp3_tables as T
from ffmpeg_tpu.codecs.mp3 import _init_tables, _HUFF_LUTS
from ffmpeg_tpu.io import open_input
from ffmpeg_tpu.io.stream import CodecParameters, MediaType


class BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def bytes(self, pad_to=None):
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        if pad_to is not None:
            out += b"\x00" * (pad_to - len(out))
        return bytes(out)


def _huff_code(table_select, x, y):
    """Find the canonical code for symbol (x,y) for a table_select index."""
    vlc_idx, _linbits = T.HUFF_DATA[table_select]
    pos = sum(T.HUFF_SIZES[:vlc_idx - 1])
    n = T.HUFF_SIZES[vlc_idx - 1]
    code = 0
    for i in range(n):
        l = T.HUFF_LENS[pos + i]
        sym = T.HUFF_SYMBOLS[pos + i]
        c = code >> (32 - l)
        if sym == ((x << 4) | y):
            return c, l
        code += 1 << (32 - l)
    raise KeyError((vlc_idx, x, y))


_SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
         (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3)]


def craft_frame(pairs=((1, 1),), block_type=None, global_gain=210,
                table_select=1, nch=1, ms=False, quads=(), sfc=0,
                scalefacs=None, preflag=0, sf_scale=0, escapes=()):
    """One MPEG-1 44.1kHz 320kbps Layer III frame. Both granules carry the
    same content. `quads` are count1 4-tuples of 0/±1; `escapes` are
    (x, y) with components >= 15 encoded via linbits."""
    w = BitWriter()
    w.put(0x7FF, 11)
    w.put(3, 2)          # MPEG-1
    w.put(1, 2)          # Layer III
    w.put(1, 1)          # no CRC
    w.put(14, 4)         # 320 kbps
    w.put(0, 2)          # 44100
    w.put(0, 1)          # no padding
    w.put(0, 1)
    w.put(1 if ms else (3 if nch == 1 else 0), 2)   # mode
    w.put(2 if ms else 0, 2)                        # mode_ext (MS on)
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 2)

    all_pairs = list(pairs) + list(escapes)
    _vlc, linbits = T.HUFF_DATA[table_select]

    # main data (built first to know part2_3_length)
    md = BitWriter()
    nbits = []               # per (gr, ch)
    sfbits = []
    slen1, slen2 = _SLEN[sfc]
    for gr in range(2):
        for ch in range(nch):
            start = len(md.bits)
            if scalefacs is not None:
                for i in range(11):
                    md.put(scalefacs[i % len(scalefacs)], slen1)
                for i in range(10):
                    md.put(scalefacs[i % len(scalefacs)], slen2)
            sfbits.append(len(md.bits) - start)
            for (x, y) in all_pairs:
                cx, cy = min(x, 15), min(y, 15)
                c, l = _huff_code(table_select, cx, cy)
                md.put(c, l)
                if cx == 15 and linbits:
                    md.put(x - 15, linbits)
                if x:
                    md.put(0, 1)     # positive
                if cy == 15 and linbits:
                    md.put(y - 15, linbits)
                if y:
                    md.put(0, 1)
            for q in quads:          # count1 table A
                sym = sum((1 << (3 - i)) for i, v in enumerate(q) if v)
                md.put(T.QUAD_CODES[0][sym], T.QUAD_BITS[0][sym])
                for v in q:
                    if v:
                        md.put(1 if v < 0 else 0, 1)
            nbits.append(len(md.bits) - start)

    # side info: 17 (mono) / 32 (stereo) bytes for MPEG-1
    w.put(0, 9)                            # main_data_begin
    w.put(0, 3 if nch == 2 else 5)         # private
    for _ in range(nch):
        w.put(0, 4)                        # scfsi
    for gr in range(2):
        for ch in range(nch):
            w.put(nbits[gr * nch + ch], 12)    # part2_3_length
            w.put(len(all_pairs), 9)           # big_values
            w.put(global_gain, 8)
            w.put(sfc if scalefacs is not None else 0, 4)
            if block_type is None:
                w.put(0, 1)                    # no window switching
                for _ in range(3):
                    w.put(table_select, 5)
                w.put(0, 4)                    # region_address1
                w.put(0, 3)                    # region_address2
            else:
                w.put(1, 1)                    # window switching
                w.put(block_type, 2)
                w.put(0, 1)                    # switch_point
                for _ in range(2):
                    w.put(table_select, 5)
                for _ in range(3):
                    w.put(0, 3)                # subblock_gain
            w.put(preflag, 1)
            w.put(sf_scale, 1)
            w.put(0, 1)                        # count1table_select A
    assert len(w.bits) == 32 + (136 if nch == 1 else 256)

    frame = w.bytes() + md.bytes()
    size = 144 * 320000 // 44100           # 1044
    assert len(frame) <= size
    return frame + b"\x00" * (size - len(frame))


def _our_decode(path):
    d = open_input(str(path))
    assert d.streams[0].codecpar.codec_id.startswith("mp")
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    frames = dec.decode_all(d.packets())
    # interleave channels to match the reference's wav layout
    return np.concatenate([np.asarray(f.audio_data).T.ravel()
                           for f in frames])


def _ref_decode(path):
    # slim build has no f32le muxer; use wav + pcm_f32le
    raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(path),
         "-c:a", "pcm_f32le", "-f", "wav", "-"],
        check=True, capture_output=True).stdout
    i = raw.find(b"data")
    return np.frombuffer(raw[i + 8:], "<f4")


def _compare(ours, ref):
    n = min(len(ours), len(ref))
    assert n >= 1152 * 3
    o, r = ours[:n], ref[:n]
    peak = np.abs(r).max()
    assert 1e-4 < peak < 0.99               # present, and ref not clipping
    err = np.abs(o - r).max()
    # the slim reference build uses the fixed-point mp3 decoder: its
    # output is quantized to 2^-15 steps
    assert err < max(5e-4 * peak, 2.0 ** -13), f"max err {err}, peak {peak}"


@requires_ref
def test_long_block_tone_matches_reference(tmp_path):
    p = tmp_path / "t.mp3"
    p.write_bytes(craft_frame(pairs=((1, 1), (2, 0), (0, 3)),
                              table_select=5, global_gain=190) * 8)
    _compare(_our_decode(p), _ref_decode(p))


@requires_ref
def test_short_block_matches_reference(tmp_path):
    p = tmp_path / "s.mp3"
    p.write_bytes(craft_frame(pairs=((1, 1), (1, 0)), block_type=2,
                              global_gain=190) * 8)
    _compare(_our_decode(p), _ref_decode(p))


@requires_ref
def test_gain_and_table15(tmp_path):
    p = tmp_path / "g.mp3"
    p.write_bytes(craft_frame(pairs=((3, 2), (5, 7)), global_gain=180,
                              table_select=15) * 8)
    _compare(_our_decode(p), _ref_decode(p))


def test_huffman_luts_are_prefix_complete():
    _init_tables()
    for maxlen, sym_t, len_t in _HUFF_LUTS:
        assert (len_t > 0).all()            # every prefix decodes


@requires_ref
def test_stereo_ms_matches_reference(tmp_path):
    p = tmp_path / "ms.mp3"
    p.write_bytes(craft_frame(pairs=((1, 1), (0, 2)), table_select=5,
                              global_gain=188, nch=2, ms=True) * 8)
    _compare(_our_decode(p), _ref_decode(p))


@requires_ref
def test_stereo_lr_matches_reference(tmp_path):
    p = tmp_path / "lr.mp3"
    p.write_bytes(craft_frame(pairs=((2, 1),), table_select=5,
                              global_gain=190, nch=2) * 8)
    _compare(_our_decode(p), _ref_decode(p))


@requires_ref
def test_count1_quads(tmp_path):
    p = tmp_path / "q.mp3"
    p.write_bytes(craft_frame(pairs=((1, 1),), table_select=5,
                              global_gain=190,
                              quads=((1, 0, -1, 0), (0, 1, 0, -1))) * 8)
    _compare(_our_decode(p), _ref_decode(p))


@requires_ref
def test_linbits_escape(tmp_path):
    p = tmp_path / "e.mp3"
    # table_select 16 -> vlc 14, linbits 1: value 16 = 15 + linbits(1)
    p.write_bytes(craft_frame(pairs=((1, 1),), escapes=((16, 15),),
                              table_select=16, global_gain=170) * 8)
    _compare(_our_decode(p), _ref_decode(p))


@requires_ref
def test_scalefactors_preflag_scale(tmp_path):
    p = tmp_path / "sf.mp3"
    p.write_bytes(craft_frame(pairs=((1, 1), (2, 2), (0, 3)),
                              table_select=5, global_gain=185,
                              sfc=5, scalefacs=(1, 0, 2), preflag=1,
                              sf_scale=1) * 8)
    _compare(_our_decode(p), _ref_decode(p))


@requires_ref
def test_bit_reservoir(tmp_path):
    """Frame 2's main data lives at the tail of frame 1 (main_data_begin).
    The whole stream must still decode identically to the reference."""
    size = 144 * 320000 // 44100
    base = craft_frame(pairs=((1, 1), (2, 0)), table_select=5,
                       global_gain=190)
    # main data bytes of one frame = everything after 4+17 header/side
    md = base[21:]
    md_len = 0
    # recompute used main-data byte length from part2_3 bits
    bits = 0
    for _ in range(2):
        for (x, y) in ((1, 1), (2, 0)):
            _c, l = _huff_code(5, x, y)
            bits += l + (1 if x else 0) + (1 if y else 0)
    md_used = (bits + 7) // 8
    K = md_used                      # put frame2's md fully in frame1
    # frame 1: normal, but with frame2's main data appended in its padding
    f1 = base[:size - K] + md[:K]
    # frame 2: header + side info with main_data_begin=K, all padding after
    w = BitWriter()
    hdr_si = base[:21]
    # patch main_data_begin (first 9 bits after 32-bit header)
    b = bytearray(hdr_si)
    b[4] = (K >> 1) & 0xFF
    b[5] = (b[5] & 0x7F) | ((K & 1) << 7)
    f2 = bytes(b) + b"\x00" * (size - 21)
    stream = base + f1 + f2 + base * 2
    p = tmp_path / "resv.mp3"
    p.write_bytes(stream)
    ours = _our_decode(p)
    ref = _ref_decode(p)
    _compare(ours, ref)
    # frame 2 (third frame in stream) must carry real signal, not silence
    seg = ref[2 * 1152:3 * 1152]
    assert np.abs(seg).max() > 1e-3


# ---------------- Layer II ---------------------------------------------------

def craft_mp2_frame(seed=0, nch=1):
    """MPEG-1 Layer II frame, 44100/64kbps-per-channel (alloc table 0)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    w = BitWriter()
    w.put(0x7FF, 11)
    w.put(3, 2)           # MPEG-1
    w.put(2, 2)           # Layer II
    w.put(1, 1)           # no CRC
    br_idx = 5 if nch == 1 else 8    # 64 / 128 kbps total
    w.put(br_idx, 4)
    w.put(0, 2)           # 44100
    w.put(0, 1)
    w.put(0, 1)
    w.put(3 if nch == 1 else 0, 2)   # mono / stereo
    w.put(0, 2)
    w.put(0, 4)
    kbps = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
            256, 320, 384][br_idx]
    size = 144 * kbps * 1000 // 44100

    sblimit = T.SBLIMITS[0]
    alloc = T.ALLOC_TABLES[0]
    # allocate a few low subbands with ungrouped quant, rest zero
    ba = np.zeros((2, sblimit), np.int32)
    for i in range(6):
        ba[:, i] = int(rng.integers(1, 5))
    j = 0
    for i in range(sblimit):
        nb = alloc[j]
        for ch in range(nch):
            w.put(int(ba[ch, i]), nb)
        j += 1 << nb
    sf = np.zeros((2, sblimit, 3), np.int32)
    for i in range(sblimit):
        for ch in range(nch):
            if ba[ch, i]:
                w.put(0, 2)          # scale_code 0: three scalefactors
    for i in range(sblimit):
        for ch in range(nch):
            if ba[ch, i]:
                vals = [int(rng.integers(20, 40)) for _ in range(3)]
                sf[ch, i] = vals
                for v in vals:
                    w.put(v, 6)
    for k in range(3):
        for l in range(0, 12, 3):
            j = 0
            for i in range(sblimit):
                nb = alloc[j]
                for ch in range(nch):
                    b = int(ba[ch, i])
                    if b:
                        qindex = alloc[j + b]
                        qbits = T.QUANT_BITS[qindex]
                        steps = T.QUANT_STEPS[qindex]
                        if qbits < 0:
                            v = 0
                            mul = 1
                            for m in range(3):
                                v += int(rng.integers(0, steps)) * mul
                                mul *= steps
                            w.put(v, -qbits)
                        else:
                            for m in range(3):
                                w.put(int(rng.integers(0, steps)), qbits)
                j += 1 << nb
    data = w.bytes()
    assert len(data) <= size
    return data + b"\x00" * (size - len(data))


@requires_ref
@pytest.mark.parametrize("nch", [1, 2])
def test_mp2_matches_reference(tmp_path, nch):
    p = tmp_path / "t.mp2"
    p.write_bytes(b"".join(craft_mp2_frame(seed=s, nch=nch)
                           for s in range(6)))
    ours = _our_decode_mp2(p)
    ref = _ref_decode(p)
    n = min(len(ours), len(ref))
    assert n >= 1152 * 4 * nch
    o, r = ours[:n], ref[:n]
    peak = np.abs(r).max()
    assert peak > 1e-3
    err = np.abs(o - r).max()
    assert err < max(1e-3 * peak, 2.0 ** -12), f"err {err} peak {peak}"


def _our_decode_mp2(path):
    d = open_input(str(path))
    assert d.streams[0].codecpar.codec_id == "mp2"
    dec = CodecContext.open_decoder(d.streams[0].codecpar)
    frames = dec.decode_all(d.packets())
    return np.concatenate([np.asarray(f.audio_data).T.ravel()
                           for f in frames])


def craft_frame_lsf(pairs=((1, 1), (2, 0)), table_select=5,
                    global_gain=190):
    """MPEG-2 (LSF) mono 22.05kHz Layer III frame: 1 granule, 9-bit
    scalefac_compress (0 -> no scalefactor bits), no preflag field."""
    w = BitWriter()
    w.put(0x7FF, 11)
    w.put(2, 2)          # MPEG-2
    w.put(1, 2)          # Layer III
    w.put(1, 1)          # no CRC
    w.put(8, 4)          # 64 kbps
    w.put(0, 2)          # 22050
    w.put(0, 1)
    w.put(0, 1)
    w.put(3, 2)          # mono
    w.put(0, 2)
    w.put(0, 4)

    md = BitWriter()
    for (x, y) in pairs:
        c, l = _huff_code(table_select, x, y)
        md.put(c, l)
        if x:
            md.put(0, 1)
        if y:
            md.put(0, 1)
    nbits = len(md.bits)

    w.put(0, 8)              # main_data_begin
    w.put(0, 1)              # private (mono LSF: 1 bit)
    w.put(nbits, 12)
    w.put(len(pairs), 9)
    w.put(global_gain, 8)
    w.put(0, 9)              # scalefac_compress (LSF: 9 bits)
    w.put(0, 1)              # no window switching
    for _ in range(3):
        w.put(table_select, 5)
    w.put(0, 4)
    w.put(0, 3)
    w.put(0, 1)              # scalefac_scale (no preflag field in LSF)
    w.put(0, 1)              # count1table_select
    assert len(w.bits) == 32 + 72

    frame = w.bytes() + md.bytes()
    size = 144 * 64000 // (22050 * 2)      # LSF L3: 72 slots/frame
    assert len(frame) <= size
    return frame + b"\x00" * (size - len(frame))


@requires_ref
def test_lsf_mpeg2_matches_reference(tmp_path):
    p = tmp_path / "lsf.mp3"
    p.write_bytes(craft_frame_lsf() * 10)
    ours = _our_decode(p)
    ref = _ref_decode(p)
    n = min(len(ours), len(ref))
    assert n >= 576 * 6
    peak = np.abs(ref[:n]).max()
    assert 1e-4 < peak < 0.99
    err = np.abs(ours[:n] - ref[:n]).max()
    assert err < max(5e-4 * peak, 2.0 ** -13), f"err {err} peak {peak}"


# ---------------- Layer I ----------------------------------------------------

def craft_mp1_frame(seed=0, nch=1):
    """MPEG-1 Layer I frame, 44100 Hz, 256/448 kbps."""
    rng = np.random.default_rng(seed)
    w = BitWriter()
    w.put(0x7FF, 11)
    w.put(3, 2)            # MPEG-1
    w.put(3, 2)            # Layer I
    w.put(1, 1)            # no CRC
    br_idx = 8 if nch == 1 else 12    # 256 / 384 kbps
    w.put(br_idx, 4)
    w.put(0, 2)            # 44100
    w.put(0, 1)
    w.put(0, 1)
    w.put(3 if nch == 1 else 0, 2)
    w.put(0, 2)
    w.put(0, 4)
    kbps = 32 * br_idx
    size = (12 * kbps * 1000 // 44100) * 4

    alloc = np.zeros((2, 32), np.int32)
    for i in range(10):
        alloc[:, i] = int(rng.integers(1, 9))
    for i in range(32):
        for ch in range(nch):
            w.put(int(alloc[ch, i]), 4)
    for i in range(32):
        for ch in range(nch):
            if alloc[ch, i]:
                w.put(int(rng.integers(0, 60)), 6)
    for _j in range(12):
        for i in range(32):
            for ch in range(nch):
                n = int(alloc[ch, i])
                if n:
                    w.put(int(rng.integers(0, (1 << (n + 1)) - 1)), n + 1)
    data = w.bytes()
    assert len(data) <= size, (len(data), size)
    return data + b"\x00" * (size - len(data))


def _compare_l1(ours, ref, min_samples):
    n = min(len(ours), len(ref))
    assert n >= min_samples
    o, r = ours[:n], ref[:n]
    peak = np.abs(r).max()
    assert 1e-4 < peak < 0.999
    err = np.abs(o - r).max()
    assert err < max(5e-4 * peak, 2.0 ** -13), f"max err {err}"


@pytest.mark.parametrize("nch", [1, 2])
def test_layer1_crafted_decodes(tmp_path, nch):
    """The slim reference build has no Layer I decoder; validate the new
    bit parsing + dequant against an independent spec-derived subband
    reconstruction fed through the (Layer II/III-validated) shared
    synthesis filterbank."""
    from ffmpeg_tpu.ops import mp3fb
    import jax.numpy as jnp

    data = b"".join(craft_mp1_frame(seed=s, nch=nch) for s in range(4))
    p = tmp_path / "t.mp1"
    p.write_bytes(data)
    ours = _our_decode(p)

    # independent parse of the crafted frames (mirrors the crafter)
    sf_tab = 2.0 * (2.0 ** (-1.0 / 3.0)) ** np.arange(64)
    pcm_ref = []
    fifo = jnp.zeros((nch, 16, 64), jnp.float32)
    for seed in range(4):
        rng = np.random.default_rng(seed)
        alloc = np.zeros((2, 32), np.int32)
        for i in range(10):
            alloc[:, i] = int(rng.integers(1, 9))
        sf = np.zeros((2, 32), np.int32)
        for i in range(32):
            for ch in range(nch):
                if alloc[ch, i]:
                    sf[ch, i] = int(rng.integers(0, 60))
        sb = np.zeros((nch, 12, 32), np.float32)
        for j in range(12):
            for i in range(32):
                for ch in range(nch):
                    n = int(alloc[ch, i])
                    if n:
                        b = n + 1
                        v = int(rng.integers(0, (1 << b) - 1))
                        sb[ch, j, i] = (2 * v + 1 - (1 << b)) \
                            / float((1 << b) - 1) * sf_tab[sf[ch, i]]
        out, fifo = mp3fb.synth_granule(jnp.asarray(sb), fifo)
        pcm_ref.append(np.asarray(out).T.ravel())
    want = np.concatenate(pcm_ref)
    n = min(len(ours), len(want))
    assert n == 384 * 4 * nch
    np.testing.assert_allclose(ours[:n], want[:n], atol=1e-6)
