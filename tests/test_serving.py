"""Job API tests against a mock inference backend (SURVEY.md §4: statuses
starting/processing/succeeded/failed, logs with NN%, rate limits,
ownership).  Drives the real HTTP server over a socket."""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from manual_whisper_tpu.audio import write_wav
from manual_whisper_tpu.serving.server import create_server
from manual_whisper_tpu.serving.second_pass import (SecondPassOptions,
                                                    merge_recovered,
                                                    run_second_pass,
                                                    select_ranges)


class MockBackend:
    """Scripted backend: emits NN% logs, returns canned segments."""

    def __init__(self, delay=0.0, fail=False, segments=None):
        self.delay = delay
        self.fail = fail
        self.segments = segments if segments is not None else [
            {"text": "大家好，今天开会", "start": 0.0, "end": 3.0},
            {"text": "请使用简体中文。", "start": 3.0, "end": 4.0},
        ]
        self.calls = []

    def transcribe(self, audio_path, language, progress, options=None):
        self.calls.append((audio_path, language))
        progress(25.0, "encoding")
        if self.delay:
            time.sleep(self.delay)
        if self.fail:
            raise RuntimeError("synthetic backend failure")
        progress(75.0, "decoding")
        return {"segments": [dict(s) for s in self.segments],
                "language": language}


@pytest.fixture()
def server(tmp_path):
    backend = MockBackend()
    srv = create_server(backend, host="127.0.0.1", port=0,
                        upload_dir=str(tmp_path / "uploads"))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield srv, backend, base
    srv.shutdown()


def _req(method, url, data=None, headers=None):
    req = urllib.request.Request(url, data=data, method=method,
                                 headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def _upload_wav(base, tmp_path, seconds=0.1):
    wav_path = tmp_path / "a.wav"
    write_wav(wav_path, np.zeros(int(16000 * seconds), np.float32))
    status, out = _req("POST", f"{base}/api/upload",
                       data=wav_path.read_bytes(),
                       headers={"x-file-name": "a.wav"})
    assert status == 200 and out["fileUrl"].startswith("http")
    return out["fileUrl"]


def _poll_until_done(base, job_id, timeout=10.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        status, out = _req("GET", f"{base}/api/transcribe?id={job_id}")
        assert status == 200
        if out["status"] in ("succeeded", "failed"):
            return out
        time.sleep(0.05)
    raise TimeoutError("job did not finish")


def test_full_job_flow(server, tmp_path):
    srv, backend, base = server
    file_url = _upload_wav(base, tmp_path)

    status, created = _req(
        "POST", f"{base}/api/transcribe",
        data=json.dumps({"fileUrl": file_url, "language": "zh"}).encode(),
        headers={"Content-Type": "application/json"})
    assert status == 201
    assert created["status"] in ("starting", "processing")
    assert set(created["progress"]) >= {"percent", "status", "elapsedSec",
                                        "logsTail"}

    out = _poll_until_done(base, created["id"])
    assert out["status"] == "succeeded"
    assert out["progress"]["percent"] == 100
    # post-processing applied: prompt-leak segment dropped
    segs = out["output"]["json"]["segments"]
    assert [s["text"] for s in segs] == ["大家好，今天开会"]
    assert out["output"]["json"]["cleanup_stats"]["input_segments"] == 2
    assert "quality_report" in out["output"]["json"]
    assert out["output"]["markdown"].startswith("# 录音转写")
    assert "[00:00:00 - 00:00:03] 大家好，今天开会" in out["output"]["markdown"]
    assert backend.calls and backend.calls[0][1] == "zh"


def test_progress_percent_from_logs(server, tmp_path):
    srv, backend, base = server
    backend.delay = 0.6
    file_url = _upload_wav(base, tmp_path)
    _, created = _req(
        "POST", f"{base}/api/transcribe",
        data=json.dumps({"fileUrl": file_url, "language": "en"}).encode())
    time.sleep(0.25)
    status, out = _req("GET", f"{base}/api/transcribe?id={created['id']}")
    assert out["status"] == "processing"
    assert out["progress"]["percent"] == 25       # parsed from "25% encoding"
    assert out["progress"]["logsTail"]
    _poll_until_done(base, created["id"])


def test_failed_job_surfaces_error(server, tmp_path):
    srv, backend, base = server
    backend.fail = True
    file_url = _upload_wav(base, tmp_path)
    _, created = _req(
        "POST", f"{base}/api/transcribe",
        data=json.dumps({"fileUrl": file_url}).encode())
    out = _poll_until_done(base, created["id"])
    assert out["status"] == "failed"
    assert "synthetic backend failure" in out["error"]


def test_language_validation_defaults_to_zh(server, tmp_path):
    srv, backend, base = server
    file_url = _upload_wav(base, tmp_path)
    _, created = _req(
        "POST", f"{base}/api/transcribe",
        data=json.dumps({"fileUrl": file_url,
                         "language": "klingon"}).encode())
    _poll_until_done(base, created["id"])
    assert backend.calls[-1][1] == "zh"


def test_post_validation(server):
    srv, backend, base = server
    status, out = _req("POST", f"{base}/api/transcribe", data=b"{}")
    assert status == 400 and out["error"] == "Missing fileUrl"
    status, out = _req("POST", f"{base}/api/transcribe",
                       data=json.dumps({"fileUrl": "ftp://x"}).encode())
    assert status == 400 and out["error"] == "Invalid file URL"
    status, out = _req("POST", f"{base}/api/transcribe",
                       data=json.dumps(
                           {"fileUrl": "http://evil/other"}).encode())
    assert status == 400 and out["error"] == "Unknown file URL"


def test_get_validation_and_ownership(server, tmp_path, monkeypatch):
    srv, backend, base = server
    status, out = _req("GET", f"{base}/api/transcribe")
    assert status == 400 and out["error"] == "Missing id"
    status, out = _req("GET", f"{base}/api/transcribe?id=nonexistent")
    assert status == 404 and out["error"] == "Prediction not found"

    # ownership: another IP cannot read the job (proxy mode, spoofed XFF)
    monkeypatch.setenv("MWX_TRUST_PROXY", "true")
    file_url = _upload_wav(base, tmp_path)
    _, created = _req("POST", f"{base}/api/transcribe",
                      data=json.dumps({"fileUrl": file_url}).encode())
    status, out = _req("GET", f"{base}/api/transcribe?id={created['id']}",
                       headers={"x-forwarded-for": "10.9.9.9"})
    assert status == 404 and out["error"] == "Prediction not found"


def test_forwarded_for_ignored_without_trusted_proxy(server, tmp_path):
    """x-forwarded-for is attacker-controlled: without MWX_TRUST_PROXY the
    server must key rate limits and ownership on the socket address, so a
    spoofed header neither hides a job from its owner nor resets limits."""
    srv, backend, base = server
    file_url = _upload_wav(base, tmp_path)
    _, created = _req("POST", f"{base}/api/transcribe",
                      data=json.dumps({"fileUrl": file_url}).encode())
    # spoofed XFF: still the same (real) client -> job remains visible
    status, out = _req("GET", f"{base}/api/transcribe?id={created['id']}",
                       headers={"x-forwarded-for": "10.9.9.9"})
    assert status == 200 and out["status"] in ("starting", "processing",
                                               "succeeded")
    _poll_until_done(base, created["id"])


def test_file_urls_rejected_by_default(server, tmp_path, monkeypatch):
    """file:// URLs let remote clients read arbitrary local audio; they are
    rejected unless MWX_ALLOW_LOCAL_FILE_URLS is explicitly enabled."""
    srv, backend, base = server
    wav = tmp_path / "local.wav"
    write_wav(wav, np.zeros(1600, np.float32))

    status, out = _req("POST", f"{base}/api/transcribe",
                       data=json.dumps({"fileUrl": f"file://{wav}"}).encode())
    assert status == 400 and out["error"] == "Invalid file URL"

    monkeypatch.setenv("MWX_ALLOW_LOCAL_FILE_URLS", "true")
    status, created = _req(
        "POST", f"{base}/api/transcribe",
        data=json.dumps({"fileUrl": f"file://{wav}"}).encode())
    assert status == 201
    out = _poll_until_done(base, created["id"])
    assert out["status"] == "succeeded"


def test_upload_slow_client_times_out(server, monkeypatch):
    """A client that stalls mid-body must not pin a server thread
    (reference streams with a cap per chunk, upload.js:100-136)."""
    import socket as socketlib
    srv, backend, base = server
    monkeypatch.setenv("MWX_UPLOAD_READ_TIMEOUT_SEC", "0.4")
    host, port = srv.server_address
    t0 = time.time()
    with socketlib.create_connection((host, port), timeout=5) as sock:
        sock.sendall(b"POST /api/upload HTTP/1.1\r\n"
                     b"Host: x\r\nContent-Length: 1000000\r\n\r\n")
        sock.sendall(b"x" * 10)  # then stall
        sock.settimeout(5)
        data = sock.recv(65536)
    assert b"408" in data.split(b"\r\n", 1)[0]
    assert time.time() - t0 < 4.0


def test_upload_content_length_cap(server):
    """Declared length beyond the cap is rejected before any body read,
    with the reference's English cap message (upload.js:48)."""
    import socket as socketlib
    srv, backend, base = server
    host, port = srv.server_address
    with socketlib.create_connection((host, port), timeout=5) as sock:
        sock.sendall(b"POST /api/upload HTTP/1.1\r\nHost: x\r\n"
                     b"Content-Length: 209715200\r\n\r\n")
        sock.settimeout(5)
        data = b""
        while b"Upload too large" not in data:
            chunk = sock.recv(65536)
            if not chunk:
                break
            data += chunk
    assert b"413" in data.split(b"\r\n", 1)[0]
    assert b"Upload too large (max 100MB)" in data


def test_map_upload_error_table():
    """zh-CN backend-error contract (reference: mapUploadError,
    upload.js:138-168)."""
    from manual_whisper_tpu.serving.server import map_upload_error
    assert map_upload_error(413) == (413, "传输文件过大（当前上限约 100MB）")
    assert map_upload_error(429) == (429, "请求过于频繁，请稍后重试")
    assert map_upload_error(500) == (500, "AI 处理服务暂时不可用，请稍后重试")
    assert map_upload_error(503, "boom") == (
        503, "AI 处理服务暂时不可用，请稍后重试")
    assert map_upload_error(422, "bad payload") == (
        422, "数据处理失败：bad payload")
    assert map_upload_error(422) == (422, "数据处理失败，请稍后重试")
    assert map_upload_error(None, "x" * 300)[1].startswith("Upload failed: ")
    assert map_upload_error() == (500, "Upload failed")
    # truncation: 140-char cap with ellipsis for 4xx detail
    long = map_upload_error(422, "y" * 200)[1]
    assert long.endswith("…") and len(long) <= len("数据处理失败：") + 140


def test_active_job_cap(server, tmp_path, monkeypatch):
    srv, backend, base = server
    backend.delay = 1.0
    srv.app_state.store.max_active_per_ip = 1
    file_url = _upload_wav(base, tmp_path)
    _, first = _req("POST", f"{base}/api/transcribe",
                    data=json.dumps({"fileUrl": file_url}).encode())
    status, out = _req("POST", f"{base}/api/transcribe",
                       data=json.dumps({"fileUrl": file_url}).encode())
    assert status == 429 and "Too many active jobs" in out["error"]
    _poll_until_done(base, first["id"])


def test_post_rate_limit(server):
    srv, backend, base = server
    srv.app_state.store.post_limit = 2
    codes = []
    for _ in range(3):
        status, _ = _req("POST", f"{base}/api/transcribe", data=b"{}")
        codes.append(status)
    assert codes[:2] == [400, 400]       # pass rate check, fail validation
    assert codes[2] == 429


def test_upload_validation(server):
    srv, backend, base = server
    status, out = _req("POST", f"{base}/api/upload", data=b"")
    assert status == 400 and out["error"] == "Empty upload body"
    status, out = _req("GET", f"{base}/api/upload")
    assert status == 405


def test_shared_key_auth(server, tmp_path, monkeypatch):
    srv, backend, base = server
    monkeypatch.setenv("ENFORCE_APP_SHARED_KEY", "true")
    monkeypatch.setenv("APP_SHARED_KEY", "sekret")
    status, out = _req("POST", f"{base}/api/upload", data=b"xx")
    assert status == 401 and out["error"] == "Missing app key"
    status, out = _req("POST", f"{base}/api/upload", data=b"xx",
                       headers={"x-app-key": "wrong"})
    assert status == 401 and out["error"] == "Invalid app key"
    status, out = _req("POST", f"{base}/api/upload", data=b"xx",
                       headers={"x-app-key": "sekret"})
    assert status == 200

    status, out = _req("POST", f"{base}/api/transcribe", data=b"{}")
    assert status == 401 and out["error"] == "Unauthorized"
    status, out = _req("POST", f"{base}/api/transcribe", data=b"{}",
                       headers={"Authorization": "Bearer sekret"})
    assert status == 400   # auth ok, fails validation


# ---------------------------------------------------------------------------
# second pass
# ---------------------------------------------------------------------------

def test_select_ranges_filters():
    report = {"suspicious_ranges": [
        {"start": 0, "end": 1, "duration": 1.0},
        {"start": 5, "end": 20, "duration": 15.0},
        {"start": 30, "end": 40, "duration": 10.0},
    ]}
    opts = SecondPassOptions(min_range_sec=1.5, max_ranges=1)
    assert select_ranges(report, opts) == [report["suspicious_ranges"][1]]


def test_run_second_pass_recovers_and_merges():
    audio = np.zeros(16000 * 40, np.float32)
    primary = [{"text": "开头", "start": 0.0, "end": 2.0}]
    report = {"suspicious_ranges": [
        {"start": 10.0, "end": 22.0, "duration": 12.0}]}
    calls = []

    def clip_transcriber(clip, language, vad_onset, vad_offset,
                         temperature):
        calls.append((len(clip), vad_onset, vad_offset))
        return {"segments": [{"text": "找回的内容", "start": 1.0,
                              "end": 3.0}]}

    out = run_second_pass(audio, "zh", primary, report, clip_transcriber,
                          SecondPassOptions(vad_onset=0.6, vad_offset=0.42,
                                            range_pad_sec=1.2))
    assert calls and calls[0][1] == 0.6
    texts = [(s["text"], s.get("second_pass", False))
             for s in out["segments"]]
    assert ("开头", False) in texts
    assert ("找回的内容", True) in texts
    # recovered segment re-anchored to absolute time (10-1.2+1 = 9.8)
    rec = [s for s in out["segments"] if s.get("second_pass")][0]
    assert rec["start"] == pytest.approx(9.8)
    assert out["second_pass"]["recovered_segments"] == 1


def test_progress_percent_fallback_without_percent_logs():
    """When processing logs carry no 'NN%' marker, the server synthesizes
    50 (reference: buildProgressPayload, transcribe.js:221-226); the
    client-side estimator covers the no-percent case separately."""
    from manual_whisper_tpu.serving.jobs import Job
    from manual_whisper_tpu.serving.server import build_progress_payload
    job = Job(id="j", ip="1.1.1.1", language="zh", audio_path="",
              source_filename="")
    job.status = "processing"
    job.logs = ["loading model", "still working"]
    payload = build_progress_payload(job)
    assert payload["percent"] == 50
    assert payload["logsTail"] == ["loading model", "still working"]
    job.logs = ["30% encoding"]
    assert build_progress_payload(job)["percent"] == 30
    job.status = "succeeded"
    assert build_progress_payload(job)["percent"] == 100
    job.status = "starting"
    assert build_progress_payload(job)["percent"] == 0


def test_second_pass_options_from_env(monkeypatch):
    """All SECOND_PASS_* knobs of web/.env.example:38-47 are consumed."""
    monkeypatch.setenv("SECOND_PASS_BATCH_SIZE", "8")
    monkeypatch.setenv("SECOND_PASS_DIARIZATION", "true")
    monkeypatch.setenv("SECOND_PASS_USE_INITIAL_PROMPT", "yes")
    monkeypatch.setenv("SECOND_PASS_MAX_RANGES", "2")
    opts = SecondPassOptions.from_env()
    assert opts.batch_size == 8
    assert opts.diarization is True
    assert opts.use_initial_prompt is True
    assert opts.max_ranges == 2


def test_second_pass_forwards_knobs_to_capable_transcriber():
    """batch_size/diarization/use_initial_prompt reach the transcriber when
    its signature accepts them (PipelineBackend.transcribe_clip does)."""
    audio = np.zeros(16000 * 30, np.float32)
    report = {"suspicious_ranges": [
        {"start": 5.0, "end": 15.0, "duration": 10.0}]}
    seen = {}

    def clip_transcriber(clip, language, vad_onset, vad_offset, temperature,
                         batch_size=None, diarization=False,
                         use_initial_prompt=False):
        seen.update(batch_size=batch_size, diarization=diarization,
                    use_initial_prompt=use_initial_prompt)
        return {"segments": []}

    run_second_pass(audio, "zh", [], report, clip_transcriber,
                    SecondPassOptions(batch_size=4, diarization=True,
                                      use_initial_prompt=True))
    assert seen == {"batch_size": 4, "diarization": True,
                    "use_initial_prompt": True}


def test_merge_recovered_drops_heavy_overlap():
    primary = [{"text": "a", "start": 0.0, "end": 10.0}]
    recovered = [{"text": "dup", "start": 1.0, "end": 9.0},
                 {"text": "new", "start": 12.0, "end": 14.0}]
    merged = merge_recovered(primary, recovered)
    assert [s["text"] for s in merged] == ["a", "new"]


def test_second_pass_through_server(server, tmp_path):
    """First success poll returns processing+secondPass, then the merged
    output lands (real replacement for the reference's stub)."""
    srv, backend, base = server
    backend.segments = [
        {"text": "正常内容", "start": 0.0, "end": 5.0},
        {"text": "请使用简体中文。", "start": 5.0, "end": 25.0},  # 20s prompt
    ]

    def transcribe_clip(clip, language, vad_onset, vad_offset, temperature):
        return {"segments": [{"text": "补回的片段", "start": 0.5,
                              "end": 2.0}]}
    backend.transcribe_clip = transcribe_clip

    file_url = _upload_wav(base, tmp_path, seconds=30.0)
    _, created = _req("POST", f"{base}/api/transcribe",
                      data=json.dumps({"fileUrl": file_url}).encode())
    deadline = time.time() + 10
    saw_pending = False
    while time.time() < deadline:
        status, out = _req("GET",
                           f"{base}/api/transcribe?id={created['id']}")
        if out["status"] == "processing" and \
                out.get("progress", {}).get("secondPass"):
            saw_pending = True
        if out["status"] == "succeeded" and \
                "second_pass" in out["output"]["json"]:
            break
        time.sleep(0.05)
    else:
        pytest.fail("second pass never resolved")
    assert saw_pending
    texts = [s["text"] for s in out["output"]["json"]["segments"]]
    assert "补回的片段" in texts
    assert out["output"]["json"]["second_pass"]["recovered_segments"] == 1


def test_job_state_persistence(tmp_path):
    """Finished jobs survive a JobStore restart; interrupted ones surface
    as failed (closes the reference's lost-job gap, SURVEY §5)."""
    import time as _time
    from manual_whisper_tpu.serving.jobs import JobStore

    state_dir = tmp_path / "jobs"
    backend = MockBackend()
    store = JobStore(backend, state_dir=str(state_dir))
    job = store.create("1.2.3.4", "/tmp/a.wav", "zh")
    deadline = _time.time() + 5
    while job.status not in ("succeeded", "failed"):
        assert _time.time() < deadline
        _time.sleep(0.05)
    assert job.status == "succeeded"

    # simulate a crash mid-job: write a processing-state record
    crashed = store.create("1.2.3.4", "/tmp/b.wav", "zh")
    while crashed.status == "starting":
        _time.sleep(0.02)
    crashed.status = "processing"
    store._persist(crashed)

    restarted = JobStore(backend, state_dir=str(state_dir))
    restored = restarted.get(job.id)
    assert restored is not None
    assert restored.status == "succeeded"
    assert restored.output["segments"]
    assert restored.ip == "1.2.3.4"
    interrupted = restarted.get(crashed.id)
    assert interrupted.status == "failed"
    assert "restarted" in interrupted.error


def test_m4a_upload_rejected_without_any_decoder(server, monkeypatch):
    """An undecodable container is rejected at upload time with an
    actionable zh-CN message, not a job-time stack (VERDICT r2 #8).
    The reference's own default input is an .m4a (transcribe.py:239).
    Requires BOTH decode paths absent: the ffmpeg CLI and the in-process
    ffdec shim (hosts with either accept the upload)."""
    import shutil as _shutil

    from manual_whisper_tpu.audio import io as audio_io
    from manual_whisper_tpu.audio import native as audio_native
    srv, backend, base = server
    monkeypatch.setattr(_shutil, "which", lambda name: None)
    monkeypatch.setattr(audio_native, "get_ffdec", lambda: None)
    monkeypatch.setattr(audio_io.shutil, "which", lambda name: None)
    status, out = _req("POST", f"{base}/api/upload", data=b"\x00" * 64,
                       headers={"x-file-name": "meeting.m4a"})
    assert status == 415
    assert "ffmpeg" in out["error"]
    assert "WAV" in out["error"]
    assert "m4a" in out["error"]


def test_unsupported_format_error_zh():
    from manual_whisper_tpu.audio.io import UnsupportedFormatError
    err = UnsupportedFormatError(".m4a")
    assert ".m4a" in err.zh and "ffmpeg" in err.zh
    assert "install ffmpeg" in str(err)


def test_success_poll_response_is_cached(server, tmp_path):
    """Terminal responses compute cleanup/markdown once per job; later
    polls return the cached payload (VERDICT r2 weak #6)."""
    from manual_whisper_tpu.text import processor as proc_mod
    srv, backend, base = server
    file_url = _upload_wav(base, tmp_path)
    _, created = _req("POST", f"{base}/api/transcribe",
                      data=json.dumps({"fileUrl": file_url}).encode())
    first = _poll_until_done(base, created["id"])
    assert first["status"] == "succeeded"

    # poisoning the post-processor proves later polls never re-run it
    calls = []
    orig = proc_mod.post_process_segments

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    import manual_whisper_tpu.serving.server as server_mod
    old = server_mod.post_process_segments
    server_mod.post_process_segments = counting
    try:
        status, again = _req("GET",
                             f"{base}/api/transcribe?id={created['id']}")
    finally:
        server_mod.post_process_segments = old
    assert status == 200
    assert not calls
    assert again["output"] == first["output"]


def test_second_pass_result_survives_restart(tmp_path):
    """Second-pass output persists: a restart between primary success and
    a later poll still serves the merged result (VERDICT r2 weak #5)."""
    import time as _time
    from manual_whisper_tpu.serving.jobs import JobStore

    state_dir = tmp_path / "jobs"
    backend = MockBackend()
    store = JobStore(backend, state_dir=str(state_dir))
    job = store.create("1.2.3.4", "/tmp/a.wav", "zh")
    deadline = _time.time() + 5
    while job.status not in ("succeeded", "failed"):
        assert _time.time() < deadline
        _time.sleep(0.05)

    # what the server's second-pass worker does when the re-pass lands
    job.second_pass_result = {
        "segments": [{"text": "补回", "start": 0.0, "end": 1.0}],
        "second_pass": {"enabled": True, "recovered_segments": 1},
    }
    store._persist(job)

    restarted = JobStore(backend, state_dir=str(state_dir))
    restored = restarted.get(job.id)
    assert restored.second_pass_result is not None
    assert restored.second_pass_result["second_pass"][
        "recovered_segments"] == 1


def test_bearer_auth_fails_closed_when_key_missing(server, monkeypatch):
    """ENFORCE_APP_SHARED_KEY=true with APP_SHARED_KEY unset must 500 on
    the job API (like the upload path), not silently serve
    unauthenticated."""
    from manual_whisper_tpu import config as mwx_config
    srv, backend, base = server
    monkeypatch.setenv("ENFORCE_APP_SHARED_KEY", "true")
    monkeypatch.delenv("APP_SHARED_KEY", raising=False)
    mwx_config.clear_env_cache()
    try:
        status, out = _req("POST", f"{base}/api/transcribe",
                           data=b"{}")
        assert status == 500 and "APP_SHARED_KEY" in out["error"]
        status, _ = _req("GET", f"{base}/api/transcribe?id=x")
        assert status == 500
    finally:
        monkeypatch.delenv("ENFORCE_APP_SHARED_KEY", raising=False)
        mwx_config.clear_env_cache()


def test_static_no_sibling_directory_escape(tmp_path):
    """Path containment must not be a string-prefix check: /srv/web must
    not serve /srv/web-private/* via raw ../ paths."""
    import http.client
    web = tmp_path / "web"
    web.mkdir()
    (web / "index.html").write_text("<html>ok</html>")
    sibling = tmp_path / "web-private"
    sibling.mkdir()
    (sibling / "secret.txt").write_text("TOP SECRET")

    backend = MockBackend()
    srv = create_server(backend, host="127.0.0.1", port=0,
                        upload_dir=str(tmp_path / "up"),
                        web_dir=str(web))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        # raw request: urllib normalizes ../, http.client does not
        conn = http.client.HTTPConnection(
            "127.0.0.1", srv.server_address[1], timeout=10)
        conn.putrequest("GET", "/../web-private/secret.txt",
                        skip_host=False)
        conn.endheaders()
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 404, body
        assert b"TOP SECRET" not in body
        conn.close()
    finally:
        srv.shutdown()


def test_truncated_upload_rejected(server):
    """A body shorter than Content-Length (client disconnect) must not be
    stored and acknowledged as valid audio."""
    import http.client
    srv, backend, base = server
    host, port = srv.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.putrequest("POST", "/api/upload")
    conn.putheader("Content-Length", "50000")
    conn.putheader("x-file-name", "a.wav")
    conn.endheaders()
    conn.send(b"\x00" * 1000)   # then close early
    conn.sock.shutdown(1)       # no more writes
    resp = conn.getresponse()
    assert resp.status in (400, 408)
    conn.close()
    assert not list((srv.app_state.upload_dir).glob("*"))


def test_transcribe_post_body_capped(server):
    srv, backend, base = server
    status, out = _req(
        "POST", f"{base}/api/transcribe", data=b"x" * 100,
        headers={"Content-Length": str(9 * 1024 * 1024 * 1024)})
    assert status == 413


def test_upload_prune_removes_old_files(server, tmp_path):
    srv, backend, base = server
    _upload_wav(base, tmp_path)
    state = srv.app_state
    assert len(state.uploads) == 1
    fid = next(iter(state.uploads))
    state.upload_times[fid] -= 25 * 3600     # age it past the TTL
    state.prune_uploads()
    assert not state.uploads and not list(state.upload_dir.glob("*"))


def test_finished_job_releases_active_slot_without_poll(server, tmp_path):
    """An abandoned client (never polls) must not stay locked out of new
    jobs until the 24 h TTL."""
    import time as _t
    srv, backend, base = server
    srv.app_state.store.max_active_per_ip = 1
    file_url = _upload_wav(base, tmp_path)
    _, first = _req("POST", f"{base}/api/transcribe",
                    data=json.dumps({"fileUrl": file_url}).encode())
    deadline = _t.time() + 5
    while srv.app_state.store.active_count("127.0.0.1") > 0:
        assert _t.time() < deadline, "active slot never released"
        _t.sleep(0.05)
    status, _ = _req("POST", f"{base}/api/transcribe",
                     data=json.dumps({"fileUrl": file_url}).encode())
    assert status in (200, 201)   # created, not 429


def test_success_poll_processed_once(server, tmp_path, monkeypatch):
    """Post-processing runs once per job; later polls serve the cached
    terminal response (VERDICT r2 weak #6)."""
    import manual_whisper_tpu.serving.server as server_mod
    srv, backend, base = server
    file_url = _upload_wav(base, tmp_path)
    _, created = _req("POST", f"{base}/api/transcribe",
                      data=json.dumps({"fileUrl": file_url}).encode())
    out1 = _poll_until_done(base, created["id"])
    calls = []
    real = server_mod.post_process_segments
    monkeypatch.setattr(server_mod, "post_process_segments",
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    status, out2 = _req("GET",
                        f"{base}/api/transcribe?id={created['id']}")
    assert status == 200 and out2["status"] == "succeeded"
    assert calls == []          # dict lookup, no recompute
    assert out2["output"]["markdown"] == out1["output"]["markdown"]
