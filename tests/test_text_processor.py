"""Web processor tests (reference: web/api/lib/processor.js).

Table-driven cases lifted from the reference's constant tables
(PROMPT_LEAK/HALLUCINATION/NOISE, processor.js:16-48) per SURVEY.md §4.
"""

from manual_whisper_tpu.text import PostProcessOptions, post_process_segments
from manual_whisper_tpu.text.formatting import format_to_markdown


def run(segments, **opt_kw):
    return post_process_segments(segments, PostProcessOptions(**opt_kw))


def seg(text, start=0.0, end=1.0, **kw):
    return {"text": text, "start": start, "end": end, **kw}


def test_prompt_only_segment_dropped():
    out = run([seg("请使用简体中文。"), seg("术语参考：微信、支付宝")])
    assert out["segments"] == []
    assert out["stats"]["removed_prompt_only_segments"] == 2
    assert out["stats"]["input_segments"] == 2
    assert out["stats"]["output_segments"] == 0


def test_hallucination_segment_dropped_and_counted():
    out = run([
        seg("请不吝点赞 订阅 转发 打赏支持明镜与点点栏目", 0, 8),
        seg("正常发言内容在这里", 8, 12),
    ])
    assert len(out["segments"]) == 1
    assert out["segments"][0]["text"] == "正常发言内容在这里"
    assert out["stats"]["removed_hallucination_segments"] == 1


def test_youtube_spam_fragment_cleaned_inline():
    out = run([seg("今天讨论预算。点赞 订阅 转发 打赏支持大家", 0, 5)])
    assert out["segments"][0]["text"] == "今天讨论预算"
    assert out["stats"]["cleaned_hallucination_fragments"] == 1


def test_noise_fillers_dropped():
    out = run([
        seg("嗯", 0, 0.5),
        seg("啊。", 1, 1.8),
        seg("嗯", 2, 8),          # long duration: kept
        seg("好的收到", 9, 10),
    ])
    texts = [s["text"] for s in out["segments"]]
    assert texts == ["嗯", "好的收到"]
    assert out["stats"]["removed_noise_segments"] == 2


def test_short_single_char_dropped():
    out = run([seg("哇", 0, 0.2)])
    assert out["segments"] == []
    assert out["stats"]["removed_noise_segments"] == 1


def test_merge_adjacent_same_speaker():
    out = run([
        seg("第一句", 0, 2, speaker="SPEAKER_00"),
        seg("第二句", 2.3, 4, speaker="SPEAKER_00"),     # gap 0.3 <= 0.6
        seg("第三句", 5.5, 6, speaker="SPEAKER_00"),     # gap 1.5 > 0.6
        seg("别人说", 6.1, 7, speaker="SPEAKER_01"),     # speaker change
    ])
    texts = [s["text"] for s in out["segments"]]
    assert texts == ["第一句 第二句", "第三句", "别人说"]
    assert out["stats"]["merged_segments"] == 1
    assert out["segments"][0]["end"] == 4


def test_merge_no_speaker_key_merges():
    # JS: undefined === undefined -> merge applies without speakers
    out = run([seg("甲", 0, 1), seg("乙", 1.2, 2)])
    assert len(out["segments"]) == 1
    assert out["segments"][0]["text"] == "甲 乙"


def test_quality_report_fields_and_rounding():
    out = run([
        seg("正常内容一", 0, 10),
        seg("请使用简体中文。", 10, 30),   # 20s prompt removal -> suspicious
    ])
    q = out["quality_report"]
    assert set(q.keys()) == {
        "input_speech_sec", "output_speech_sec", "removed_speech_sec",
        "coverage_ratio", "suspicious_ranges", "warnings"}
    assert q["input_speech_sec"] == 30.0
    assert q["output_speech_sec"] == 10.0
    assert q["removed_speech_sec"] == 20.0
    assert q["coverage_ratio"] == 0.3333
    assert len(q["suspicious_ranges"]) == 1
    r = q["suspicious_ranges"][0]
    assert r["start"] == 10 and r["end"] == 30 and r["reason"] == "prompt"
    # coverage warning fires below 0.85 and the span warning fires >= 10s
    assert any("覆盖率偏低" in w for w in q["warnings"])
    assert any("可疑丢失时间段" in w for w in q["warnings"])
    assert any("00:00:10-00:00:30" in w for w in q["warnings"])


def test_suspicious_ranges_merge_at_1_2s_gap():
    out = run([
        seg("请使用简体中文", 0, 6),
        seg("请用简体中文", 7, 13),    # gap 1.0 <= 1.2: merged -> 13s span
        seg("实际内容", 14, 15),
    ])
    q = out["quality_report"]
    assert len(q["suspicious_ranges"]) == 1
    assert q["suspicious_ranges"][0]["duration"] == 13.0


def test_cleanup_stats_keys_contract():
    out = run([seg("hello world", 0, 1)])
    assert set(out["stats"].keys()) == {
        "input_segments", "output_segments", "removed_prompt_only_segments",
        "removed_hallucination_segments", "removed_noise_segments",
        "cleaned_prompt_fragments", "cleaned_hallucination_fragments",
        "merged_segments"}


def test_options_disable_paths():
    raw = [seg("请使用简体中文。附加", 0, 1), seg("嗯", 2, 2.5)]
    out = run(raw, strip_prompt_leak=False, drop_short_noise=False,
              merge_adjacent_segments=False)
    texts = [s["text"] for s in out["segments"]]
    assert "请使用简体中文" in texts[0]
    assert texts[1] == "嗯"


def test_env_resolution(monkeypatch):
    monkeypatch.setenv("TERM_REPLACEMENTS", "自定义=替换后")
    monkeypatch.setenv("MAX_MERGE_GAP_SEC", "0.1")
    opts = PostProcessOptions.from_env()
    assert opts.term_replacements["自定义"] == "替换后"
    assert opts.term_replacements["文艺标识"] == "唯一标识"  # default kept
    assert opts.max_merge_gap_sec == 0.1


def test_format_to_markdown_contract():
    md = format_to_markdown([
        {"text": "大家好", "start": 0, "end": 5, "speaker": "SPEAKER_00"},
        {"text": "开始吧", "start": 5, "end": 9.9, "speaker": "SPEAKER_00"},
        {"text": "好的", "start": 10, "end": 3672, "speaker": "SPEAKER_01"},
        {"text": "  ", "start": 12, "end": 13},
    ])
    assert md == (
        "# 录音转写\n\n"
        "\n### SPEAKER_00\n\n"
        "[00:00:00 - 00:00:05] 大家好\n\n"
        "[00:00:05 - 00:00:09] 开始吧\n\n"
        "\n### SPEAKER_01\n\n"
        "[00:00:10 - 01:01:12] 好的\n\n"
    )
