"""ctypes bindings for the native fast path (libnifti_fast.so).

Built with `make -C ct_clip_tpu/native`.  Falls back silently when the
shared object is absent; ct_clip_tpu.data.nifti uses it when available.
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = Path(__file__).parent / "libnifti_fast.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    try:
        return _bind(ctypes.CDLL(str(_LIB_PATH)))
    except (OSError, AttributeError):
        # stale .so from an older tree (missing newer symbols): rebuild once,
        # else report unavailable instead of crashing available()
        if build(quiet=True):
            try:
                return _bind(ctypes.CDLL(str(_LIB_PATH)))
            except (OSError, AttributeError):
                return None
        return None


def _bind(lib):
    global _lib
    lib.nifti_probe.restype = ctypes.c_int64
    lib.nifti_probe.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.POINTER(ctypes.c_float)]
    lib.nifti_read.restype = ctypes.c_int64
    lib.nifti_read.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_float),
                               ctypes.c_int64,
                               ctypes.POINTER(ctypes.c_int32),
                               ctypes.POINTER(ctypes.c_float)]
    lib.nifti_read_par.restype = ctypes.c_int64
    lib.nifti_read_par.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int64,
                                   ctypes.POINTER(ctypes.c_int32),
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int32]
    lib.nifti_recompress.restype = ctypes.c_int64
    lib.nifti_recompress.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_int64, ctypes.c_int32,
                                     ctypes.c_int32]
    lib.gunzip_probe.restype = ctypes.c_int64
    lib.gunzip_probe.argtypes = [ctypes.c_char_p]
    lib.gunzip_read.restype = ctypes.c_int64
    lib.gunzip_read.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_uint8),
                                ctypes.c_int64, ctypes.c_int32]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def build(quiet: bool = True) -> bool:
    """Compile the shared object in place (requires g++ and zlib)."""
    import subprocess

    res = subprocess.run(["make", "-C", str(Path(__file__).parent)],
                         capture_output=quiet, text=True)
    global _lib
    _lib = None
    return res.returncode == 0 and _LIB_PATH.exists()


def read_volume_native(path: str, threads: int = 1,
                       ) -> Optional[Tuple[np.ndarray, Tuple[float, ...], float, float]]:
    """Returns (volume[x,y,z...], pixdim(3,), scl_slope, scl_inter) or None
    if the native library is unavailable.  Raises on decode errors.

    `threads > 1` parallelises the gunzip of a single file when it is an
    indexed multi-member gzip (see `recompress`); plain .nii.gz stays serial
    because DEFLATE streams cannot be split."""
    lib = _load()
    if lib is None:
        return None
    shape = (ctypes.c_int32 * 8)()
    meta = (ctypes.c_float * 8)()
    count = lib.nifti_probe(path.encode(), shape, meta)
    if count < 0:
        raise ValueError(f"nifti_probe({path}) failed with code {count}")
    out = np.empty(count, np.float32)
    got = lib.nifti_read_par(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        count, shape, meta, max(1, int(threads)))
    if got != count:
        raise ValueError(f"nifti_read({path}) failed with code {got}")
    ndim = shape[0]
    dims = tuple(shape[1 + i] for i in range(ndim))
    vol = out.reshape(dims, order="F")
    return vol, (meta[0], meta[1], meta[2]), float(meta[3]), float(meta[4])


def read_bytes_native(path: str, threads: int = 1) -> Optional[np.ndarray]:
    """Gunzip (or plain-read) a whole file into a fresh uint8 array, with no
    NIfTI decode — backs the zero-copy int16/zyx loader path.  Indexed
    multi-member files (see `recompress`) inflate with up to `threads`
    workers straight into the output buffer; plain .gz is serial but still
    skips the Python gzip module's chunked realloc+join copies.  Returns
    None when the native library is unavailable; raises on decode errors."""
    lib = _load()
    if lib is None:
        return None
    n = lib.gunzip_probe(path.encode())
    if n < 0:
        raise ValueError(f"gunzip_probe({path}) failed with code {n}")
    out = np.empty(n, np.uint8)
    got = lib.gunzip_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, max(1, int(threads)))
    if got != n:
        raise ValueError(f"gunzip_read({path}) returned {got}, expected {n}")
    return out


def recompress(src: str, dst: str, *, chunk_bytes: int = 4 << 20,
               level: int = 6, threads: int = 0) -> int:
    """Rewrite a .nii/.nii.gz as an indexed multi-member gzip (still a valid
    .nii.gz for any reader) whose members can be inflated in parallel.
    Returns the uncompressed byte count.  threads=0 -> all cores."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libnifti_fast.so not built; run native.build()")
    if threads <= 0:
        threads = os.cpu_count() or 1
    ret = lib.nifti_recompress(src.encode(), dst.encode(), chunk_bytes,
                               level, threads)
    if ret < 0:
        raise ValueError(f"nifti_recompress({src}) failed with code {ret}")
    return int(ret)
