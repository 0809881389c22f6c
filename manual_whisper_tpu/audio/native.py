"""ctypes binding to the native audio frontend (libmwx_audio.so).

Built from ``manual_whisper_tpu/native/mwx_audio.cpp`` via its Makefile;
silently falls back to the numpy implementations when the shared object is
absent (callers catch exceptions / check for None).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _LIB_DIR / "libmwx_audio.so"

_lib = None
_lib_lock = threading.Lock()
_load_attempted = False


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_LIB_DIR)], capture_output=True,
                       check=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib():
    """Load (building on first use if possible) the native library."""
    global _lib, _load_attempted
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _load_attempted:
            return None
        _load_attempted = True
        stale = _LIB_PATH.exists() and any(
            src.stat().st_mtime > _LIB_PATH.stat().st_mtime
            for src in _LIB_DIR.glob("*.cpp"))
        if (not _LIB_PATH.exists() or stale) and not _try_build() \
                and not _LIB_PATH.exists():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.mwx_decode_wav.restype = ctypes.c_int
        lib.mwx_decode_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mwx_resample.restype = ctypes.c_int
        lib.mwx_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        if hasattr(lib, "mwx_decode_flac"):  # absent in pre-FLAC builds
            lib.mwx_decode_flac.restype = ctypes.c_int
            lib.mwx_decode_flac.argtypes = lib.mwx_decode_wav.argtypes
        lib.mwx_free.restype = None
        lib.mwx_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_decode_wav(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """Decode WAV bytes -> (mono float32, sample_rate), or None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    out_len = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.mwx_decode_wav(data, len(data), ctypes.byref(out),
                            ctypes.byref(out_len), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"mwx_decode_wav failed with code {rc}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(out_len.value,)).copy()
    finally:
        lib.mwx_free(out)
    return arr, int(sr.value)


def native_decode_flac(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """Decode FLAC bytes -> (mono float32, sample_rate), or None if no lib."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "mwx_decode_flac"):
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    out_len = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.mwx_decode_flac(data, len(data), ctypes.byref(out),
                             ctypes.byref(out_len), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"mwx_decode_flac failed with code {rc}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(out_len.value,)).copy()
    finally:
        lib.mwx_free(out)
    return arr, int(sr.value)


_ffdec = None
_ffdec_attempted = False
_ffdec_lock = threading.Lock()   # NOT _lib_lock: an ffdec `make` must not
#                                  block concurrent WAV/FLAC decodes
_FFDEC_PATH = _LIB_DIR / "libmwx_ffdec.so"
# Lazy-path build cap: the first get_ffdec() on a host without a prebuilt
# .so can sit on a serving request (upload validation consults
# decodable_suffixes()); keep that stall short and do the full-length
# build at startup via warm_native_libs() instead.
_LAZY_BUILD_TIMEOUT = 20.0


def warm_native_libs() -> None:
    """Build+load both native libraries with the full build budget.

    Call at process startup (server serve(), CLI entry) so the first
    request never pays a C++ compile; after this, request-path calls are
    a cached-pointer return or at most a dlopen."""
    get_lib()
    get_ffdec(build_timeout=120.0)


def get_ffdec(build_timeout: float = _LAZY_BUILD_TIMEOUT):
    """Load the compressed-container decoder (libmwx_ffdec.so), or None.

    Separate from libmwx_audio so the dependency-free WAV/FLAC frontend
    never gains a link-time FFmpeg requirement; this .so exists only on
    hosts with the libav* libraries (native/Makefile builds it
    best-effort)."""
    global _ffdec, _ffdec_attempted
    with _ffdec_lock:
        if _ffdec is not None:
            return _ffdec
        if _ffdec_attempted:
            return None
        _ffdec_attempted = True
        stale = _FFDEC_PATH.exists() and \
            (_LIB_DIR / "mwx_ffdec.cpp").exists() and \
            (_LIB_DIR / "mwx_ffdec.cpp").stat().st_mtime \
            > _FFDEC_PATH.stat().st_mtime
        if not _FFDEC_PATH.exists() or stale:
            try:
                subprocess.run(["make", "-C", str(_LIB_DIR), "ffdec"],
                               capture_output=True, timeout=build_timeout)
            except Exception:
                pass
        if not _FFDEC_PATH.exists():
            return None
        try:
            lib = ctypes.CDLL(str(_FFDEC_PATH))
        except OSError:
            return None
        lib.mwx_decode_any.restype = ctypes.c_int
        lib.mwx_decode_any.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mwx_encode_fixture.restype = ctypes.c_int
        lib.mwx_encode_fixture.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.mwx_ffdec_free.restype = None
        lib.mwx_ffdec_free.argtypes = [ctypes.c_void_p]
        _ffdec = lib
        return _ffdec


def native_decode_any(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """Decode any compressed container (m4a/mp3/ogg/...) -> (mono float32,
    sample_rate); None when the ffdec lib is unavailable; raises
    ValueError on undecodable bytes."""
    lib = get_ffdec()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    out_len = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.mwx_decode_any(data, len(data), ctypes.byref(out),
                            ctypes.byref(out_len), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"mwx_decode_any failed with code {rc}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(out_len.value,)).copy()
    finally:
        lib.mwx_ffdec_free(out)
    return arr, int(sr.value)


def native_encode_fixture(pcm: np.ndarray, sr: int, format_name: str,
                          codec_name: str = "") -> Optional[bytes]:
    """Encode mono float32 PCM into a compressed container (TEST fixture
    maker — mp3/ipod(m4a)/ogg); None when the ffdec lib is unavailable."""
    lib = get_ffdec()
    if lib is None:
        return None
    pcm = np.ascontiguousarray(pcm, dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_uint64()
    rc = lib.mwx_encode_fixture(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pcm.size, sr,
        format_name.encode(), codec_name.encode(),
        ctypes.byref(out), ctypes.byref(out_len))
    if rc != 0:
        raise ValueError(f"mwx_encode_fixture({format_name!r}) failed "
                         f"with code {rc}")
    try:
        data = ctypes.string_at(out, out_len.value)
    finally:
        lib.mwx_ffdec_free(out)
    return data


def native_resample(audio: np.ndarray, sr_in: int, sr_out: int
                    ) -> Optional[np.ndarray]:
    """Resample via the native library, or None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    out_n = ctypes.c_int64()
    rc = lib.mwx_resample(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.size, sr_in, sr_out, ctypes.byref(out), ctypes.byref(out_n))
    if rc != 0:
        raise ValueError(f"mwx_resample failed with code {rc}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(out_n.value,)).copy()
    finally:
        lib.mwx_free(out)
    return arr
