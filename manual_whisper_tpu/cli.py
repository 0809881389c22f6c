"""Command-line transcription driver.

Behavioral equivalent of the reference CLI (transcribe.py:98-247): same
.env-driven config surface (WHISPER_MODEL, BATCH_SIZE, HF_TOKEN,
.env.example), same pipeline order (load model -> load audio -> transcribe
-> align -> diarize -> clean), same step-timing/RTF self-reporting
(SURVEY.md §5 "tracing"), and byte-identical Markdown/JSON output via
text.formatting.  The engine underneath is the TPU pipeline instead of
CTranslate2/PyTorch.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

from . import config
from .audio import load_audio
from .pipeline import load_model
from .text import INITIAL_PROMPT, clean_result_segments, format_transcript

SAMPLE_RATE = 16000


def _backend_name() -> str:
    """The actual JAX backend ("tpu"/"cpu"/...), for honest run labels."""
    import jax
    try:
        name = jax.default_backend()
    except Exception:
        return "unknown"
    return "tpu" if name == "axon" else name


def transcribe_audio(audio_file: str, hf_token=None,
                     model_size=None, batch_size=None, device=None,
                     compute_type="bfloat16"):
    """Pipeline orchestration (reference: transcribe_audio,
    transcribe.py:98-183): returns (result_dict, audio_duration_sec)."""
    model_size = model_size or config.get_env("WHISPER_MODEL", "large-v3")
    batch_size = batch_size or config.get_int("BATCH_SIZE", 4)
    device = device or _backend_name()

    print(f"🎙️ 正在转写: {audio_file}")
    print(f"📊 配置: 模型={model_size} | 设备={device} | "
          f"精度={compute_type} | 批大小={batch_size}")

    step_start = time.time()
    print(f"📝 加载 Whisper {model_size} 模型...")
    model = load_model(
        model_size, device, compute_type=compute_type, language="zh",
        asr_options={"initial_prompt": INITIAL_PROMPT,
                     # the reference's CT2 engine decodes with beam 5 by
                     # default; greedy is our default (faster, near-equal
                     # WER with the fallback ladder) — opt in via .env
                     "beam_size": config.get_int("BEAM_SIZE", 1),
                     # bf16 per-position int8 cross-KV scales: halves
                     # scale HBM traffic, +2.3% decode throughput at
                     # batch 32 (tools/bench_decode_step.py --ab ckv16)
                     "ckv_scale_bf16":
                         config.get_env("MWX_CKV_SCALE", "f32") == "bf16"},
        vad_options={
            "vad_onset": config.get_float("VAD_ONSET", 0.5),
            "vad_offset": config.get_float("VAD_OFFSET", 0.363),
        })
    print(f"   模型加载耗时: {time.time() - step_start:.1f}s")

    print("🔊 加载音频...")
    audio = load_audio(audio_file)
    audio_duration = len(audio) / SAMPLE_RATE
    print(f"   音频时长: {audio_duration:.0f}s ({audio_duration/60:.1f}min)")

    step_start = time.time()
    print("✍️ 转写中 (可能需要几分钟)...")
    result = model.transcribe(audio, batch_size=batch_size, language="zh")
    transcribe_time = time.time() - step_start
    rtf = transcribe_time / max(audio_duration, 1e-9)
    print(f"   转写耗时: {transcribe_time:.1f}s (实时比: {rtf:.1f}x)")

    # word-level alignment (reference: whisperx.align, transcribe.py:130-131)
    step_start = time.time()
    print("🎯 对齐时间戳...")
    try:
        from .models.align import align_result
        result = align_result(result, audio, language="zh")
        print(f"   对齐耗时: {time.time() - step_start:.1f}s")
    except Exception as exc:  # degradation ladder: keep segment timestamps
        print(f"⚠️ 对齐失败: {exc}")
        print("   保留 VAD 段级时间戳继续。")

    # diarization (reference: transcribe.py:137-151 — failure tolerant)
    if hf_token:
        step_start = time.time()
        print("👥 识别说话人...")
        try:
            from .models.diarize import DiarizationPipeline, \
                assign_word_speakers
            diarizer = DiarizationPipeline(use_auth_token=hf_token)
            diarize_segments = diarizer(audio)
            result = assign_word_speakers(diarize_segments, result)
            print(f"   说话人分离耗时: {time.time() - step_start:.1f}s")
        except Exception as exc:
            print(f"⚠️ 说话人分离失败: {exc}")
            print("   继续生成不带说话人标签的转写稿...")
    else:
        print("⚠️ 未设置 HF_TOKEN，跳过说话人分离。请在 .env 中设置 HF_TOKEN。")

    print("🧹 清理转写文本...")
    cleaned, cleaned_count, dropped = clean_result_segments(
        result.get("segments", []))
    result["segments"] = cleaned
    if cleaned_count:
        print(f"   修复了 {cleaned_count} 处文本问题")
    if dropped:
        print(f"   删除了 {dropped} 条提示词污染片段")

    return result, audio_duration


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    total_start = time.time()

    audio_file = argv[0] if argv else "New Recording 46.m4a"
    if not os.path.exists(audio_file):
        print(f"❌ 文件不存在: {audio_file}")
        return 1

    # fail on undecodable containers BEFORE the expensive model load
    # (the reference's default input is .m4a, transcribe.py:239 — on an
    # ffmpeg-less host that must be an actionable message, not a stack
    # trace after minutes of weight loading).  With ffmpeg present any
    # container it can decode is accepted, like the reference.
    import shutil as _shutil
    from .audio.io import UnsupportedFormatError, decodable_suffixes
    suffix = Path(audio_file).suffix.lower()
    if suffix and not _shutil.which("ffmpeg") \
            and suffix not in decodable_suffixes():
        print(f"❌ {UnsupportedFormatError(suffix).zh}")
        return 1

    model_size = config.get_env("WHISPER_MODEL", "large-v3")
    output_file = Path(audio_file).stem + "_transcript.md"
    result, audio_duration = transcribe_audio(
        audio_file, config.get_env("HF_TOKEN"), model_size=model_size)

    total_time = time.time() - total_start
    format_transcript(result, audio_file, output_file, audio_duration,
                      total_time, model_size=model_size,
                      compute_type="bfloat16", device=_backend_name())

    print("\n🎉 转写完成!")
    print(f"⏱️ 总耗时: {total_time:.1f}s | 音频时长: {audio_duration:.0f}s "
          f"| 实时比: {total_time/max(audio_duration, 1e-9):.1f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
