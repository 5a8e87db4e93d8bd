"""CLI end-to-end tests (the fftools layer)."""

import json
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
    if refutil.REF.exists():
        data = refutil.run(["-f", "lavfi", "-i",
                            "testsrc2=size=128x96:rate=25",
                            "-frames:v", "5", "-pix_fmt", "yuv420p",
                            "-f", "yuv4mpegpipe", "-"])
        p.write_bytes(data)
        return p
    from conftest import own_y4m_clip
    return own_y4m_clip(p)


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
def test_probe_xml(y4m_clip, capsys):
    rc = probe_main(["-show_streams", "-of", "xml", str(y4m_clip)])
    assert rc == 0
    out = capsys.readouterr().out
    import xml.etree.ElementTree as ET
    root = ET.fromstring(out)
    assert root.tag == "ffprobe"
    streams = root.find("streams")
    assert streams is not None
    assert streams[0].get("width") == "128"


@requires_ref
def test_probe_mermaid(y4m_clip, capsys):
    rc = probe_main(["-show_streams", "-of", "mermaid", str(y4m_clip)])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("graph LR")
    assert "stream_0" in out


@requires_ref
def test_probe_packets_csv(y4m_clip, capsys):
    rc = probe_main(["-show_packets", "-of", "csv", str(y4m_clip)])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 5
    assert lines[0].startswith("packet,video,0,")


def test_bsf_chomp_on_stream_copy(tmp_path):
    # pad PCM packets with trailing zeros is hard to stage; use noise bsf
    # determinism + chomp no-op instead: copy with chomp must equal plain copy
    import refutil
    wav = tmp_path / "in.wav"
    sr, n = 8000, 800
    import numpy as np
    pcm = (np.sin(np.arange(n) * 0.05) * 2000).astype("<i2").tobytes()
    import struct
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)))
    wav.write_bytes(hdr + pcm)
    a, b = tmp_path / "a.wav", tmp_path / "b.wav"
    assert fftpu_main(["-i", str(wav), "-c", "copy", "-y", str(a)]) == 0
    assert fftpu_main(["-i", str(wav), "-c", "copy", "-bsf:a", "chomp",
                       "-y", str(b)]) == 0
    # chomp strips trailing NULs; sine data has none mid-stream, so equal
    assert a.read_bytes() == b.read_bytes()


def test_bsf_noise_corrupts_output(y4m_clip, tmp_path):
    a, b = tmp_path / "a.y4m", tmp_path / "b.y4m"
    assert fftpu_main(["-i", str(y4m_clip), "-c", "copy", "-y", str(a)]) == 0
    assert fftpu_main(["-i", str(y4m_clip), "-c", "copy",
                       "-bsf:v", "noise=amount=50:seed=7",
                       "-y", str(b)]) == 0
    assert a.read_bytes() != b.read_bytes()
    assert a.stat().st_size == b.stat().st_size


def test_bsf_unknown_name_errors(y4m_clip, tmp_path, capsys):
    rc = fftpu_main(["-i", str(y4m_clip), "-c", "copy",
                     "-bsf:v", "definitely_not_a_bsf",
                     "-y", str(tmp_path / "o.y4m")])
    assert rc == 1


@requires_ref
def test_cli_multi_output_and_map(tmp_path):
    """One input, two outputs with -map: video-only mjpeg AVI + audio-only
    wav, in a single run (ffmpeg multi-output semantics)."""
    av_file = tmp_path / "in.mkv"
    subprocess.run([str(refutil.REF), "-v", "error",
                    "-f", "lavfi", "-i", "testsrc2=size=96x64:rate=10",
                    "-f", "lavfi", "-i", "sine=frequency=440:sample_rate=44100",
                    "-t", "0.5", "-c:v", "mjpeg", "-q:v", "4",
                    "-pix_fmt", "yuvj420p", "-c:a", "aac",
                    "-y", str(av_file)], check=True, capture_output=True)
    v_out = tmp_path / "v.avi"
    a_out = tmp_path / "a.wav"
    rc = fftpu_main(["-v", "error", "-i", str(av_file),
               "-map", "0:v:0", "-c:v", "copy", "-y", str(v_out),
               "-map", "0:a:0", "-c:a", "pcm_s16le", "-y", str(a_out)])
    assert rc == 0
    pv = subprocess.run(
        [str(refutil.REF).replace("ffmpeg", "ffprobe"), "-v", "error",
         "-show_entries", "stream=codec_type,codec_name", "-of", "csv",
         str(v_out)], check=True, capture_output=True).stdout.decode()
    assert "video" in pv and "audio" not in pv
    pa = subprocess.run(
        [str(refutil.REF).replace("ffmpeg", "ffprobe"), "-v", "error",
         "-show_entries", "stream=codec_type", "-of", "csv",
         str(a_out)], check=True, capture_output=True).stdout.decode()
    assert "audio" in pa and "video" not in pa
    # both decodable by the reference
    for f in (v_out, a_out):
        subprocess.run([str(refutil.REF), "-v", "error", "-i", str(f),
                        "-f", "null", "-"], check=True,
                       capture_output=True)


@requires_ref
def test_progress_and_ffreport(y4m_clip, tmp_path, monkeypatch):
    """-progress writes machine-readable blocks; FFREPORT tees a log
    file (cmdutils.c FFREPORT / ffmpeg -progress analogs)."""
    prog = tmp_path / "progress.txt"
    report = tmp_path / "report.log"
    monkeypatch.setenv("FFREPORT", f"file={report}")
    out = tmp_path / "o.y4m"
    rc = fftpu_main(["-i", str(y4m_clip), "-progress", str(prog),
                     "-y", str(out)])
    assert rc == 0
    text = prog.read_text()
    assert "progress=end" in text and "frame=" in text
    assert report.exists()
    assert "fftpu command line" in report.read_text()


@requires_ref
def test_print_graphs_file(y4m_clip, tmp_path):
    """-print_graphs_file dumps the pipeline DAG (graphprint.c analog)."""
    import json
    g = tmp_path / "graph.json"
    out = tmp_path / "o.y4m"
    rc = fftpu_main(["-i", str(y4m_clip), "-vf", "scale=64:48",
                     "-print_graphs_file", str(g), "-y", str(out)])
    assert rc == 0
    doc = json.loads(g.read_text())
    assert doc["inputs"][0]["format"] == "yuv4mpegpipe"
    assert doc["chains"][0]["mode"] == "transcode"
    assert doc["outputs"][0]["streams"] == 1


@requires_ref
def test_shortest_trims_to_earliest_stream(tmp_path):
    """-shortest: output stops at the earliest-ending stream
    (sync_queue.c limiting-stream semantics). 0.5 s of video + 1.5 s of
    audio in, -shortest out → audio trimmed to video's end, matching
    the reference's packet counts."""
    vsrc = tmp_path / "v.avi"
    asrc = tmp_path / "a.wav"
    src = tmp_path / "in.avi"
    subprocess.run(
        [str(refutil.REF), "-v", "error",
         "-f", "lavfi", "-i", "testsrc2=size=128x96:rate=25",
         "-t", "0.5", "-c:v", "mjpeg", "-q:v", "4",
         "-pix_fmt", "yuvj420p", "-y", str(vsrc)],
        check=True, capture_output=True)
    subprocess.run(
        [str(refutil.REF), "-v", "error",
         "-f", "lavfi", "-i", "sine=frequency=440:sample_rate=44100",
         "-t", "1.5", "-c:a", "pcm_s16le", "-y", str(asrc)],
        check=True, capture_output=True)
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(vsrc),
         "-i", str(asrc), "-map", "0:v", "-map", "1:a", "-c", "copy",
         "-y", str(src)], check=True, capture_output=True)

    def counts(path):
        out = subprocess.run(
            [str(refutil.REF), "-v", "error", "-i", str(path),
             "-c", "copy", "-fflags", "+bitexact",
             "-f", "framecrc", "-"],
            check=True, capture_output=True, text=True).stdout
        c = {}
        for l in out.splitlines():
            if l and l[0].isdigit():
                sid = int(l.split(",")[0])
                c[sid] = c.get(sid, 0) + 1
        return c

    ref_out = tmp_path / "ref.avi"
    subprocess.run(
        [str(refutil.REF), "-v", "error", "-i", str(src),
         "-c", "copy", "-shortest", "-y", str(ref_out)],
        check=True, capture_output=True)
    ours_out = tmp_path / "ours.avi"
    rc = fftpu_main(["-v", "error", "-i", str(src), "-c", "copy",
                     "-shortest", "-y", str(ours_out)])
    assert rc == 0
    rc_counts = counts(ref_out)
    our_counts = counts(ours_out)
    # video kept in full
    assert our_counts[0] == rc_counts[0]
    # audio trimmed to ~0.5 s like the reference (the reference's
    # muxer-side interleaving may differ by one packet)
    assert abs(our_counts[1] - rc_counts[1]) <= 1, \
        (our_counts, rc_counts)
    # and decisively shorter than the untrimmed 1.5 s
    assert our_counts[1] < counts(src)[1] * 0.6


@requires_ref
def test_probe_show_frames(tmp_path, capsys):
    """-show_frames: per-frame sections match the reference ffprobe's
    pts/key_frame/dimensions on an MJPEG clip (ffprobe.c
    show_frames)."""
    clip = tmp_path / "f.mjpeg"
    subprocess.run([str(refutil.REF), "-v", "error", "-f", "lavfi",
                    "-i", "testsrc2=size=64x48:rate=25", "-frames:v",
                    "4", "-pix_fmt", "yuvj420p", "-c:v", "mjpeg",
                    "-f", "mjpeg", "-y", str(clip)],
                   check=True, capture_output=True)
    rc = probe_main(["-show_frames", "-of", "json", "-f", "mjpeg",
                     str(clip)])
    assert rc == 0
    ours = json.loads(capsys.readouterr().out)["frames"]
    want = json.loads(subprocess.run(
        [str(refutil.REF).replace("ffmpeg", "ffprobe"), "-v", "error",
         "-show_frames", "-of", "json", "-f", "mjpeg", str(clip)],
        check=True, capture_output=True).stdout)["frames"]
    assert len(ours) == len(want) == 4
    for o, w in zip(ours, want):
        # raw MJPEG has no container timestamps; time bases differ
        # (ours 1/25 vs the reference's 1/1200000) so compare seconds
        assert abs(float(o["pts_time"]) - float(w["pts_time"])) < 1e-6
        assert o["key_frame"] == w["key_frame"]
        assert o["width"] == w["width"]
        assert o["height"] == w["height"]


@requires_ref
def test_probe_select_streams(tmp_path, capsys):
    """-select_streams a / v filters sections (ffprobe.c
    -select_streams)."""
    av = tmp_path / "av.mkv"
    subprocess.run([str(refutil.REF), "-v", "error",
                    "-f", "lavfi", "-i", "testsrc2=size=64x48:rate=10",
                    "-f", "lavfi", "-i", "sine=r=44100",
                    "-t", "0.3", "-c:v", "mjpeg", "-pix_fmt",
                    "yuvj420p", "-c:a", "pcm_s16le",
                    "-y", str(av)], check=True, capture_output=True)
    rc = probe_main(["-show_streams", "-select_streams", "a",
                     "-of", "json", str(av)])
    assert rc == 0
    st = json.loads(capsys.readouterr().out)["streams"]
    assert len(st) == 1 and st[0]["codec_type"] == "audio"
