"""AAC Parametric Stereo (HE-AAC v2) tests: crafted PS extensions
spliced into SBR+LC streams (the test_aacsbr method); the reference
decoder and ours must produce the same STEREO output within an SNR
gate (aacps.c differential)."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.codecs import CodecContext
from ffmpeg_tpu.codecs.aacps import HUFF_ENC, IID_DF0, ICC_DF, \
    IID_DF1, IPD_DF, OPD_DF
from ffmpeg_tpu.core.packet import Packet
from ffmpeg_tpu.io.stream import CodecParameters, MediaType
from ffmpeg_tpu.utils.rational import Rational

from test_aacsbr import (Bits, _make_lc_noise, _snr, splice_sbr)


def _hw(w, table_idx, val):
    ln, code = HUFF_ENC[table_idx][val]
    w.u(code, ln)


def write_ps_payload(rng, iid_mode=1, icc_mode=1, num_env_idx=1,
                     header=True, iid_range=5, ipdopd=False):
    """One ps_data() payload (ISO 14496-3 8.4.4; aacps_common.c)."""
    nr_tab = (10, 20, 34, 10, 20, 34)
    nr_ipd_tab = (5, 11, 17, 5, 11, 17)
    nr = nr_tab[iid_mode]
    nr_icc = nr_tab[icc_mode]
    nr_ipd = nr_ipd_tab[iid_mode]
    quant = iid_mode > 2
    w = Bits()
    w.u(1 if header else 0, 1)            # enable_ps_header
    if header:
        w.u(1, 1)                         # enable_iid
        w.u(iid_mode, 3)
        w.u(1, 1)                         # enable_icc
        w.u(icc_mode, 3)
        w.u(1 if ipdopd else 0, 1)        # enable_ext
    w.u(0, 1)                             # frame_class FIX
    w.u(num_env_idx, 2)
    num_env = (0, 1, 2, 4)[num_env_idx]
    iid_tab = IID_DF1 if quant else IID_DF0
    for _ in range(num_env):
        w.u(0, 1)                         # dt = 0 (freq coded)
        prev = 0
        for b in range(nr):
            tgt = int(rng.integers(-iid_range, iid_range + 1))
            _hw(w, iid_tab, tgt - prev)
            prev = tgt
    for _ in range(num_env):
        w.u(0, 1)
        prev = 0
        for b in range(nr_icc):
            tgt = int(rng.integers(0, 8))
            d = tgt - prev
            d = max(-7, min(7, d))
            _hw(w, ICC_DF, d)
            prev += d
    if ipdopd:
        ext = Bits()
        ext.u(1, 1)                       # enable_ipdopd
        for _ in range(num_env):
            ext.u(0, 1)
            prev = 0
            for b in range(nr_ipd):
                tgt = int(rng.integers(0, 8))
                _hw(ext, IPD_DF, (tgt - prev) & 7)
                prev = tgt
            ext.u(0, 1)
            prev = 0
            for b in range(nr_ipd):
                tgt = int(rng.integers(0, 8))
                _hw(ext, OPD_DF, (tgt - prev) & 7)
                prev = tgt
        ext.u(0, 1)                       # reserved_ps
        total = 2 + len(ext.bits)         # id (2) + payload
        cnt = (total + 7) // 8
        w.u(cnt, 4)
        w.u(0, 2)                         # ps_extension_id = 0
        for b in ext.bits:
            w.u(b, 1)
        for _ in range(cnt * 8 - total):
            w.u(0, 1)
    return w.bits


def _decode_both_stereo(tmp_path, frames, core_rate):
    f = tmp_path / "hev2.aac"
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
    assert outs and len(outs[0].planes) == 2, "PS should upmix to stereo"
    l = np.concatenate([np.asarray(o.planes[0]).ravel() for o in outs])
    r = np.concatenate([np.asarray(o.planes[1]).ravel() for o in outs])
    return (l, r), (ref[0::2], ref[1::2])


def _run_ps(tmp_path, seed, **ps_kw):
    frames = _make_lc_noise(tmp_path)
    rng = np.random.default_rng(seed)
    ps_bits = write_ps_payload(rng, **ps_kw)
    he = splice_sbr(frames, 24000, seed=seed, ext_bits=ps_bits)
    (ol, orr), (rl, rr) = _decode_both_stereo(tmp_path, he, 24000)
    n = min(len(ol), len(rl))
    snr_l = _snr(ol[:n], rl[:n])
    snr_r = _snr(orr[:n], rr[:n])
    # stereo image must actually differ between channels
    assert not np.allclose(rl[:n], rr[:n])
    return snr_l, snr_r


@requires_ref
@pytest.mark.parametrize("seed", [1, 5])
def test_ps_basic(tmp_path, seed):
    snr_l, snr_r = _run_ps(tmp_path, seed)
    assert snr_l > 60 and snr_r > 60, (snr_l, snr_r)


@requires_ref
def test_ps_iid_fine(tmp_path):
    snr_l, snr_r = _run_ps(tmp_path, 9, iid_mode=4, icc_mode=1,
                           iid_range=10)
    assert snr_l > 60 and snr_r > 60, (snr_l, snr_r)


@requires_ref
def test_ps_multi_env(tmp_path):
    snr_l, snr_r = _run_ps(tmp_path, 13, num_env_idx=2)
    assert snr_l > 60 and snr_r > 60, (snr_l, snr_r)


@requires_ref
def test_ps_34_bands(tmp_path):
    snr_l, snr_r = _run_ps(tmp_path, 17, iid_mode=2, icc_mode=2)
    assert snr_l > 60 and snr_r > 60, (snr_l, snr_r)


@requires_ref
def test_ps_ipdopd(tmp_path):
    snr_l, snr_r = _run_ps(tmp_path, 21, ipdopd=True)
    assert snr_l > 60 and snr_r > 60, (snr_l, snr_r)
