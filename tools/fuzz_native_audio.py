#!/usr/bin/env python3
"""Mutation fuzzer for the native FLAC and WAV decoders under ASan/UBSan.

Builds a sanitizer .so from native/mwx_{audio,flac}.cpp, then hammers
mwx_decode_flac and mwx_decode_wav with mutated valid streams (bit
flips, truncations, garbage-after-magic, splices).  Both decoders parse
untrusted upload bytes in the job server, so every input must return an
error code or valid output — never crash, hang, or allocate
unboundedly.  Run with the sanitizer runtimes preloaded:

  ASAN=$(gcc -print-file-name=libasan.so)
  UBSAN=$(gcc -print-file-name=libubsan.so)
  LD_PRELOAD="$ASAN $UBSAN" ASAN_OPTIONS=detect_leaks=0:abort_on_error=1 \
      python tools/fuzz_native_audio.py 20000

Findings already fixed (see mwx_flac.cpp): attacker-controlled
STREAMINFO total driving a 128 GB reserve (now rc -5 + output cap) and
four signed-overflow/shift UBs on garbage streams (now wrapping).
"""
import ctypes
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_asan_lib() -> Path:
    out = Path(tempfile.gettempdir()) / "libmwx_asan.so"
    src = REPO / "manual_whisper_tpu" / "native"
    subprocess.run(
        ["g++", "-O1", "-g", "-fsanitize=address,undefined", "-fPIC",
         "-std=c++17", "-shared", "-o", str(out),
         str(src / "mwx_audio.cpp"), str(src / "mwx_flac.cpp")],
        check=True)
    return out


def build_asan_ffdec() -> Path:
    """Sanitizer build of the compressed-container shim.  The FFmpeg
    libraries themselves stay un-instrumented (system builds); ASan/UBSan
    still covers our demux/decode/resample glue — the code that handles
    the untrusted length/pointer plumbing."""
    out = Path(tempfile.gettempdir()) / "libmwx_ffdec_asan.so"
    src = REPO / "manual_whisper_tpu" / "native"
    subprocess.run(
        ["g++", "-O1", "-g", "-fsanitize=address,undefined", "-fPIC",
         "-std=c++17", "-shared", "-o", str(out),
         str(src / "mwx_ffdec.cpp"),
         "-lavformat", "-lavcodec", "-lavutil", "-lswresample"],
        check=True)
    return out


def main() -> int:
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    lib = ctypes.CDLL(str(build_asan_lib()))
    for fn in (lib.mwx_decode_flac, lib.mwx_decode_wav):
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
    lib.mwx_free.restype = None
    lib.mwx_free.argtypes = [ctypes.c_void_p]

    def call(decode, data: bytes, free=None) -> int:
        out = ctypes.POINTER(ctypes.c_float)()
        n = ctypes.c_int64()
        sr = ctypes.c_int32()
        rc = decode(data, len(data), ctypes.byref(out),
                    ctypes.byref(n), ctypes.byref(sr))
        if rc == 0:
            assert 0 <= n.value <= 500_000_000
            if n.value:
                np.ctypeslib.as_array(out, shape=(min(n.value, 4),)).copy()
            (free or lib.mwx_free)(out)
        return rc

    # compressed-container shim (best-effort: needs the FFmpeg dev libs)
    decode_any = None
    try:
        ffdec = ctypes.CDLL(str(build_asan_ffdec()))
        ffdec.mwx_decode_any.restype = ctypes.c_int
        ffdec.mwx_decode_any.argtypes = lib.mwx_decode_flac.argtypes
        ffdec.mwx_ffdec_free.restype = None
        ffdec.mwx_ffdec_free.argtypes = [ctypes.c_void_p]
        ffdec.mwx_encode_fixture.restype = ctypes.c_int
        ffdec.mwx_encode_fixture.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_uint64)]
        decode_any = ffdec.mwx_decode_any
    except Exception as exc:  # noqa: BLE001
        print(f"ffdec shim skipped: {exc}", file=sys.stderr)

    from manual_whisper_tpu.audio import write_wav
    from manual_whisper_tpu.audio.flacenc import encode_flac

    rng = np.random.default_rng(0)
    x = (0.3 * rng.standard_normal(20000)).clip(-1, 1).astype(np.float32)
    st = np.stack([x, np.roll(x, 7)], 1)
    seeds = [(lib.mwx_decode_flac,
              encode_flac(x, 16000, predictor=p, block_size=1024))
             for p in ("fixed0", "fixed2", "lpc", "verbatim")]
    seeds += [(lib.mwx_decode_flac,
               encode_flac(st, 16000, stereo_mode=m, block_size=1024))
              for m in ("independent", "left_side", "right_side",
                        "mid_side")]
    with tempfile.TemporaryDirectory() as td:
        for sr_hz in (16000, 44100):
            p = Path(td) / f"{sr_hz}.wav"
            write_wav(p, x, sr_hz)
            seeds.append((lib.mwx_decode_wav, p.read_bytes()))
    if decode_any is not None:
        for name in ("tone.mp3", "tone.m4a"):
            fx = REPO / "tests" / "fixtures" / name
            if fx.exists():
                seeds.append((decode_any, fx.read_bytes()))

    ok = err = 0
    for i in range(n_cases):
        decode, seed = seeds[i % len(seeds)]
        s = bytearray(seed)
        magic = bytes(seed[:4])
        kind = i % 4
        if kind == 0:      # bit flips
            for _ in range(int(rng.integers(1, 30))):
                p = int(rng.integers(0, len(s)))
                s[p] ^= 1 << int(rng.integers(0, 8))
        elif kind == 1:    # truncate
            s = s[: int(rng.integers(0, len(s)))]
        elif kind == 2:    # garbage after the container magic
            s = bytearray(magic) + bytes(
                rng.integers(0, 256, int(rng.integers(0, 4096)),
                             dtype=np.uint8))
        else:              # byte splice / duplication
            a = int(rng.integers(0, len(s)))
            b = int(rng.integers(a, len(s)))
            s = s[:a] + s[a:b] * 2 + s[b:]
        rc = call(decode, bytes(s),
                  free=(ffdec.mwx_ffdec_free
                        if decode_any is not None and decode is decode_any
                        else None))
        ok += rc == 0
        err += rc != 0
        if i % 1000 == 0:
            print(f"{i}: ok={ok} err={err}", flush=True)
    print(f"DONE {n_cases} cases: decoded={ok} rejected={err}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
