"""CLI cleaner tests (reference: transcribe.py:48-95, 156-181)."""

from manual_whisper_tpu.text import (
    clean_result_segments,
    clean_segment_text,
    remove_hallucination_loops,
)


def test_hallucination_loop_collapse():
    # reference pattern: (.{2,20}?)\1{3,} -> \1  (transcribe.py:74-79)
    assert remove_hallucination_loops("那个吧那个吧那个吧那个吧") == "那个吧"
    assert remove_hallucination_loops("okokokokok") == "ok"  # greedy {3,} eats all reps
    # under the repeat threshold: untouched
    assert remove_hallucination_loops("那个吧那个吧") == "那个吧那个吧"
    assert remove_hallucination_loops("") == ""


def test_prompt_leak_strip():
    assert clean_segment_text("请使用简体中文。大家好") == "大家好"
    assert clean_segment_text("请用简体中文！！") == ""


def test_term_replacements():
    assert clean_segment_text("扫这个搜码二维码") == "扫这个收款二维码"
    assert clean_segment_text("在AAP里面打开") == "在APP里面打开"
    assert clean_segment_text("打开AP里面的页面") == "打开APP里面的页面"


def test_punctuation_collapse_and_edge_trim():
    assert clean_segment_text("你好。。。世界") == "你好。世界"
    assert clean_segment_text("，，你好，，") == "你好"
    assert clean_segment_text("  、。！  ") == ""


def test_clean_result_segments_counts():
    segments = [
        {"text": "请使用简体中文。", "start": 0, "end": 1},
        {"text": "正常内容", "start": 1, "end": 2},
        {"text": "有问题内容。。", "start": 2, "end": 3},
    ]
    kept, cleaned_count, dropped = clean_result_segments(segments)
    assert [s["text"] for s in kept] == ["正常内容", "有问题内容"]
    assert cleaned_count == 1
    assert dropped == 1
    # input untouched (we copy)
    assert segments[2]["text"] == "有问题内容。。"
