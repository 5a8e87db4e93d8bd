"""CLI end-to-end tests (the fftools layer)."""

import subprocess

import numpy as np
import pytest

import refutil
from conftest import requires_ref

from ffmpeg_tpu.cli.ffmpeg import main as fftpu_main
from ffmpeg_tpu.cli.ffprobe import main as probe_main


@pytest.fixture
def y4m_clip(tmp_path):
    p = tmp_path / "in.y4m"
    data = refutil.run(["-f", "lavfi", "-i", "testsrc2=size=128x96:rate=25",
                        "-frames:v", "5", "-pix_fmt", "yuv420p",
                        "-f", "yuv4mpegpipe", "-"])
    p.write_bytes(data)
    return p


@requires_ref
def test_copy_framecrc_matches_reference(y4m_clip, tmp_path):
    ours = tmp_path / "ours.crc"
    rc = fftpu_main(["-i", str(y4m_clip), "-c", "copy",
                     "-f", "framecrc", str(ours)])
    assert rc == 0
    ref = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(y4m_clip), "-c", "copy",
         "-fflags", "+bitexact", "-f", "framecrc", "-"],
        check=True, capture_output=True).stdout.decode()
    assert ours.read_text() == ref


@requires_ref
def test_scale_output_decodable_by_reference(y4m_clip, tmp_path):
    out = tmp_path / "out.y4m"
    rc = fftpu_main(["-i", str(y4m_clip), "-vf", "scale=64:48",
                     "-y", str(out)])
    assert rc == 0
    ref_raw = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(out),
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    assert len(ref_raw) == 5 * (64 * 48 * 3 // 2)
    # and quality: matches reference's own scaling
    ref_scaled = subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(y4m_clip),
         "-vf", "scale=64:48:flags=bicubic+accurate_rnd+full_chroma_int+full_chroma_inp",
         "-f", "rawvideo", "-"], check=True, capture_output=True).stdout
    a = np.frombuffer(ref_raw, np.uint8).astype(np.int32)
    b = np.frombuffer(ref_scaled, np.uint8).astype(np.int32)
    assert refutil.psnr(a, b) > 50


@requires_ref
def test_mjpeg_encode_via_cli(y4m_clip, tmp_path):
    out = tmp_path / "out.mjpeg"
    rc = fftpu_main(["-i", str(y4m_clip), "-c:v", "mjpeg", "-q:v", "3",
                     "-y", str(out)])
    assert rc == 0
    probe = subprocess.run(
        [str(refutil.REF), "-v", "error", "-f", "mjpeg", "-i", str(out),
         "-f", "null", "-"], capture_output=True)
    assert probe.returncode == 0


@requires_ref
def test_audio_transcode_wav(tmp_path):
    wav = tmp_path / "in.wav"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", "sine=frequency=440:sample_rate=48000", "-t", "0.25",
                    "-y", str(wav)], check=True, capture_output=True)
    out = tmp_path / "out.wav"
    rc = fftpu_main(["-i", str(wav), "-ar", "16000", "-y", str(out)])
    assert rc == 0
    p = subprocess.run(
        [str(refutil.REFPROBE), "-v", "error", "-show_streams",
         "-of", "flat", str(out)], check=True, capture_output=True)
    info = p.stdout.decode()
    assert 'sample_rate="16000"' in info


@requires_ref
def test_frames_limit(y4m_clip, tmp_path):
    out = tmp_path / "o.y4m"
    rc = fftpu_main(["-i", str(y4m_clip), "-frames:v", "2", "-y", str(out)])
    assert rc == 0
    n = subprocess.run(
        [str(refutil.REFPROBE), "-v", "error", "-count_frames",
         "-show_streams", "-of", "flat", str(out)],
        check=True, capture_output=True).stdout.decode()
    assert 'nb_read_frames="2"' in n


@requires_ref
def test_probe_json(y4m_clip, capsys):
    rc = probe_main(["-show_streams", "-of", "json", str(y4m_clip)])
    assert rc == 0
    import json
    out = json.loads(capsys.readouterr().out)
    assert out["streams"][0]["width"] == 128


@requires_ref
def test_probe_packets_csv(y4m_clip, capsys):
    rc = probe_main(["-show_packets", "-of", "csv", str(y4m_clip)])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 5
    assert lines[0].startswith("packet,video,0,")
