"""WER / CER / DER metric tests (BASELINE parity harness plumbing)."""

import pytest

from manual_whisper_tpu.eval import cer, der, wer


def test_wer_basics():
    assert wer("hello world", "hello world") == 0.0
    assert wer("hello world", "hello there world") == pytest.approx(0.5)
    assert wer("a b c d", "a x c") == pytest.approx(0.5)  # 1 sub + 1 del
    assert wer("", "") == 0.0
    assert wer("", "something") == 1.0
    # case/punctuation-insensitive
    assert wer("Hello, World!", "hello world") == 0.0


def test_cer_chinese():
    assert cer("今天开会讨论预算", "今天开会讨论预算") == 0.0
    assert cer("今天开会", "今天开了会") == pytest.approx(0.25)
    assert cer("你好", "妳好") == pytest.approx(0.5)
    assert cer("今天。开会！", "今天开会") == 0.0  # punctuation ignored


def _seg(start, end, speaker):
    return {"start": start, "end": end, "speaker": speaker}


def test_der_perfect():
    ref = [_seg(0, 10, "A"), _seg(10, 20, "B")]
    hyp = [_seg(0, 10, "X"), _seg(10, 20, "Y")]  # labels differ: mapped
    assert der(ref, hyp, collar=0.0) == 0.0


def test_der_miss_and_fa():
    ref = [_seg(0, 10, "A")]
    hyp = [_seg(0, 5, "X")]            # 5s missed
    assert der(ref, hyp, collar=0.0) == pytest.approx(0.5, abs=0.02)
    hyp2 = [_seg(0, 10, "X"), _seg(10, 15, "X")]  # 5s false alarm
    assert der(ref, hyp2, collar=0.0) == pytest.approx(0.5, abs=0.02)


def test_der_confusion_with_optimal_mapping():
    ref = [_seg(0, 10, "A"), _seg(10, 20, "B")]
    # hypothesis swaps the second half of each turn
    hyp = [_seg(0, 5, "X"), _seg(5, 10, "Y"),
           _seg(10, 15, "Y"), _seg(15, 20, "X")]
    # optimal map: X->A, Y->B  => 10s confused out of 20
    assert der(ref, hyp, collar=0.0) == pytest.approx(0.5, abs=0.02)


def test_der_collar_forgives_boundaries():
    ref = [_seg(0, 10, "A")]
    hyp = [_seg(0.2, 10.2, "X")]       # 0.2s shift within 0.25 collar
    assert der(ref, hyp, collar=0.25) == pytest.approx(0.0, abs=0.01)


def test_der_empty_cases():
    assert der([], []) == 0.0
    assert der([], [_seg(0, 1, "X")]) == 1.0
    assert der([_seg(0, 1, "A")], [], collar=0.0) == pytest.approx(1.0)


def test_run_eval_tool_rttm_parser(tmp_path):
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "tools/run_eval.py"
    spec = importlib.util.spec_from_file_location("run_eval", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rttm = tmp_path / "a.rttm"
    rttm.write_text(
        "SPEAKER rec 1 0.00 2.50 <NA> <NA> SPEAKER_00 <NA>\n"
        "SPEAKER rec 1 2.50 1.00 <NA> <NA> SPEAKER_01 <NA>\n"
        "JUNK line ignored\n", encoding="utf-8")
    segs = mod.read_rttm(str(rttm))
    assert segs == [
        {"start": 0.0, "end": 2.5, "speaker": "SPEAKER_00"},
        {"start": 2.5, "end": 3.5, "speaker": "SPEAKER_01"},
    ]
