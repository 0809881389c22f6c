"""manual_whisper_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
`manual-whisper` meeting-transcription stack.

The reference (LuSicong22/manual-whisper) orchestrates WhisperX
(CTranslate2/PyTorch, CPU/CUDA/Replicate).  This package re-implements the
whole capability surface TPU-first:

- ``audio``     — decode/resample frontend (reference: ffmpeg via
                  whisperx.load_audio, transcribe.py:117)
- ``ops``       — Pallas/XLA kernels: fused log-mel, flash attention,
                  int8 matmul, KV-cache ops
- ``models``    — Whisper encoder-decoder, wav2vec2 CTC aligner,
                  VAD segmentation, speaker-embedding/diarization
- ``tokenizer`` — Whisper byte-level BPE + special-token scheme
- ``text``      — post-processing/quality contract (reference:
                  transcribe.py:48-95, web/api/lib/processor.js)
- ``pipeline``  — VAD chunking + batched transcribe orchestration
                  (reference: transcribe.py:98-183)
- ``parallel``  — jax.sharding mesh utilities (data/tensor parallel)
- ``serving``   — HTTP job API with the reference's create/poll contract
                  (reference: web/api/transcribe.js, web/api/upload.js)
- ``training``  — fine-tuning step (sharded), used by the multi-chip dryrun
"""

__version__ = "0.1.0"


def __getattr__(name):
    """whisperx-style top-level surface (lazy imports keep `import
    manual_whisper_tpu` light): load_model, load_audio, load_align_model,
    align, assign_word_speakers, DiarizationPipeline."""
    if name == "load_model":
        from .pipeline import load_model
        return load_model
    if name == "load_audio":
        from .audio import load_audio
        return load_audio
    if name == "load_align_model":
        from .models.align import load_align_model
        return load_align_model
    if name == "align":
        from .models.align import align
        return align
    if name == "assign_word_speakers":
        from .models.diarize import assign_word_speakers
        return assign_word_speakers
    if name == "DiarizationPipeline":
        from .models.diarize import DiarizationPipeline
        return DiarizationPipeline
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
