#!/usr/bin/env python3
"""One-time HF checkpoint conversion into the MWX_WEIGHTS_DIR registry.

The reference downloads CT2-converted weights through the HF hub cache at
load time (whisperx.load_model, reference: transcribe.py:107; README.md:95
"~3 GB, downloaded once").  This tool is the offline equivalent: given an
HF repo id (requires network + huggingface_hub) or a local checkpoint
directory, it lays the files out under the weights registry so
``load_model`` / ``load_align_model`` find them.

Usage:
  python tools/convert_weights.py openai/whisper-large-v3 /weights
  python tools/convert_weights.py /local/hf/checkpoint /weights --name large-v3
"""

import argparse
import json
import shutil
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

WANTED_FILES = (
    "config.json", "model.safetensors", "model.safetensors.index.json",
    "model-*.safetensors", "pytorch_model.bin",
    "vocab.json", "merges.txt", "added_tokens.json", "tokenizer.json",
    "tokenizer_config.json",
    "preprocessor_config.json", "generation_config.json",
)

# convenience aliases: short model name -> HF repo
ALIASES = {
    "tiny": "openai/whisper-tiny",
    "base": "openai/whisper-base",
    "small": "openai/whisper-small",
    "medium": "openai/whisper-medium",
    "large-v2": "openai/whisper-large-v2",
    "large-v3": "openai/whisper-large-v3",
    "large-v3-turbo": "openai/whisper-large-v3-turbo",
}


def fetch_or_locate(source: str) -> Path:
    src = Path(source)
    if src.exists():
        return src
    repo_id = ALIASES.get(source, source)
    try:
        from huggingface_hub import snapshot_download
    except ImportError as exc:
        raise SystemExit(
            f"{source!r} is not a local path and huggingface_hub is not "
            f"available to download it: {exc}")
    return Path(snapshot_download(repo_id, allow_patterns=list(WANTED_FILES)))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("source", help="HF repo id, alias, or local dir")
    parser.add_argument("dest", help="weights registry root "
                                     "(becomes MWX_WEIGHTS_DIR)")
    parser.add_argument("--name", default=None,
                        help="registry entry name (default: derived)")
    parser.add_argument("--verify", action="store_true",
                        help="load the converted checkpoint through the "
                             "JAX converter as a smoke test")
    args = parser.parse_args()

    src = fetch_or_locate(args.source)
    name = args.name
    if name is None:
        for alias, repo in ALIASES.items():
            if args.source in (alias, repo):
                name = alias
                break
        else:
            name = Path(args.source).name.replace("/", "--")
    dest = Path(args.dest) / name.replace("/", "--")
    dest.mkdir(parents=True, exist_ok=True)

    copied = []
    for fname in WANTED_FILES:
        if "*" in fname:          # sharded safetensors pieces
            for src_file in sorted(src.glob(fname)):
                shutil.copy2(src_file, dest / src_file.name)
                copied.append(src_file.name)
            continue
        src_file = src / fname
        if src_file.exists():
            shutil.copy2(src_file, dest / fname)
            copied.append(fname)
    if "config.json" not in copied:
        raise SystemExit(f"no config.json found under {src}")
    if not ({"model.safetensors", "pytorch_model.bin"} & set(copied)) \
            and not any(c.startswith("model-") for c in copied):
        raise SystemExit(f"no weight file found under {src}")

    cfg = json.loads((dest / "config.json").read_text())
    # tokenizer_meta.json pins the special-token layout for from_dir:
    # 51866-token models (large-v3 family) have 100 language tokens,
    # 51865 have 99 — guessing shifts every special id by one
    if cfg.get("vocab_size"):
        (dest / "tokenizer_meta.json").write_text(json.dumps(
            {"num_languages": 100 if cfg["vocab_size"] >= 51866 else 99}))
        copied.append("tokenizer_meta.json")
    print(f"installed {name} -> {dest}")
    print(f"  files: {', '.join(copied)}")
    print(f"  model_type: {cfg.get('model_type')}")

    if args.verify:
        if cfg.get("model_type") == "whisper":
            from manual_whisper_tpu.convert import load_whisper_checkpoint
            params, wcfg = load_whisper_checkpoint(dest)
            n = sum(x.size for x in __import__("jax").tree.leaves(params))
            print(f"  verified: {wcfg.name} loads, {n/1e6:.0f}M params")
        else:
            print("  (verify only implemented for whisper checkpoints)")
    print(f"\nexport MWX_WEIGHTS_DIR={Path(args.dest).resolve()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
