"""CLI integration test: `python transcribe.py audio.wav` contract
(reference usage: transcribe.py:229-247)."""

import json

import numpy as np
import pytest

from manual_whisper_tpu.audio import write_wav
from manual_whisper_tpu.cli import main

SR = 16000


def _fixture_wav(path, seconds=4.0):
    rng = np.random.default_rng(0)
    t = np.arange(int(SR * seconds)) / SR
    x = 0.002 * rng.standard_normal(len(t)).astype(np.float32)
    mask = (t % 2.0) < 1.2
    x[mask] += (0.4 * np.sin(2 * np.pi * 240 * t[mask])).astype(np.float32)
    write_wav(path, x, SR)


def test_cli_end_to_end(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("WHISPER_MODEL", "test")
    monkeypatch.delenv("HF_TOKEN", raising=False)
    monkeypatch.chdir(tmp_path)
    _fixture_wav(tmp_path / "meeting.wav")

    rc = main(["meeting.wav"])
    assert rc == 0

    out = capsys.readouterr().out
    # step self-reporting contract (SURVEY §5 tracing)
    assert "🎙️ 正在转写: meeting.wav" in out
    assert "实时比" in out
    assert "跳过说话人分离" in out          # no HF_TOKEN -> skip message
    assert "🎉 转写完成!" in out

    md = (tmp_path / "meeting_transcript.md").read_text(encoding="utf-8")
    assert md.startswith("# 会议录音转写\n\n")
    assert "**源文件**: meeting.wav" in md
    assert "**模型**: test" in md

    data = json.loads((tmp_path / "meeting_transcript.json")
                      .read_text(encoding="utf-8"))
    assert "segments" in data
    for seg in data["segments"]:
        assert {"text", "start", "end"} <= set(seg)


def test_cli_missing_file(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = main(["nope.wav"])
    assert rc == 1
    assert "❌ 文件不存在" in capsys.readouterr().out
