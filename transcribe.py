#!/usr/bin/env python3
"""CLI entry — same usage as the reference (`python transcribe.py audio.m4a`,
reference: transcribe.py:229-247), backed by the TPU pipeline."""

import sys

from manual_whisper_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
