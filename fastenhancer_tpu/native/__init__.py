"""Native host-IO runtime: build + ctypes bindings for fe_native.cpp.

The shared library is compiled on first use with the system g++ (cached by
source hash under ``_build/``) and loaded via ctypes — no pybind11 in this
environment. Everything here is optional: ``available()`` is False when
g++ is missing or the build fails, and every caller keeps its pure-Python
path (``FE_NATIVE=0`` forces the fallback).

Exposed:
  * ``shard_members(tar_path)`` — walk a plain-ustar shard tar, yielding
    ``(member_name, float32 mono ndarray)`` for wav members and
    ``(member_name, bytes)`` for anything else. Native replacement for the
    decode loop in data/shard.py (reference: lhotse tar reading,
    utils/data/shard_on_the_fly.py).
  * ``read_wav_file(path)`` — whole-file wav → (float32 mono, sr). Native
    replacement for data/audio_io._read_riff + downmix.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
import typing as tp

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fe_native.cpp")
_LOCK = threading.Lock()
_LIB: tp.Optional[ctypes.CDLL] = None
_TRIED = False


def _build_lib() -> tp.Optional[str]:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out_dir = os.path.join(_DIR, "_build")
    out = os.path.join(out_dir, f"fe_native-{tag}.so")
    if os.path.exists(out):
        return out
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    os.replace(tmp, out)  # atomic under concurrent builders
    return out


def _load() -> tp.Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("FE_NATIVE", "1") in ("0", "false", "off"):
            return None
        path = _build_lib()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.fe_shard_open.restype = ctypes.c_void_p
        lib.fe_shard_open.argtypes = [ctypes.c_char_p]
        lib.fe_shard_close.restype = None
        lib.fe_shard_close.argtypes = [ctypes.c_void_p]
        lib.fe_shard_next.restype = ctypes.c_int
        lib.fe_shard_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int)]
        lib.fe_shard_payload.restype = ctypes.c_int64
        lib.fe_shard_payload.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.fe_read_wav_file.restype = ctypes.c_int
        lib.fe_read_wav_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int)]
        if lib.fe_native_abi() != 1:
            return None
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


_F32P = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))  # noqa: E731


def shard_members(tar_path: str, buf_floats: int = 1 << 20
                  ) -> tp.Iterator[tp.Tuple[str, tp.Union[np.ndarray, bytes]]]:
    """Walk a plain-ustar tar natively; one handle per caller thread.

    Raises the same errors the Python fast walker raises (mixed-format tar,
    bad wav entry) so data/shard.py error handling is identical either way.
    """
    lib = _load()
    assert lib is not None, "native library unavailable (check available())"
    h = lib.fe_shard_open(tar_path.encode())
    if not h:
        raise OSError(f"cannot open {tar_path}")
    buf = np.empty(buf_floats, np.float32)
    name = ctypes.create_string_buffer(256)
    n_out = ctypes.c_int64()
    sr = ctypes.c_int()
    try:
        while True:
            rc = lib.fe_shard_next(h, _F32P(buf), buf.size, name, 256,
                                   ctypes.byref(n_out), ctypes.byref(sr))
            if rc == 1:
                return
            if rc == -2:  # member pending: grow and retry
                buf = np.empty(int(n_out.value), np.float32)
                continue
            mname = name.value.decode()
            if rc == 0:
                yield mname, buf[: int(n_out.value)].copy()
            elif rc == 2:
                payload = np.empty(int(n_out.value), np.uint8)
                got = lib.fe_shard_payload(
                    h, payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    payload.size)
                assert got == payload.size
                yield mname, payload.tobytes()
            elif rc == -4:
                raise ValueError(f"bad wav entry: {mname}")
            elif rc == -6:
                raise ValueError(
                    f"mixed-format tar {tar_path}: rebuild the shard with "
                    f"uniform ustar members")
            else:
                raise ValueError(f"malformed tar {tar_path} (status {rc})")
    finally:
        lib.fe_shard_close(h)


def read_wav_file(path: str) -> tp.Tuple[np.ndarray, int]:
    """Whole-file native decode -> (float32 mono, sample_rate)."""
    lib = _load()
    assert lib is not None, "native library unavailable (check available())"
    buf = np.empty(1 << 20, np.float32)
    n_out = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = lib.fe_read_wav_file(path.encode(), _F32P(buf), buf.size,
                              ctypes.byref(n_out), ctypes.byref(sr))
    if rc == -2:
        buf = np.empty(int(n_out.value), np.float32)
        rc = lib.fe_read_wav_file(path.encode(), _F32P(buf), buf.size,
                                  ctypes.byref(n_out), ctypes.byref(sr))
    if rc == -1:
        raise OSError(f"cannot read {path}")
    if rc != 0:
        raise ValueError(f"not a decodable RIFF/WAVE file: {path}")
    return buf[: int(n_out.value)].copy(), int(sr.value)
