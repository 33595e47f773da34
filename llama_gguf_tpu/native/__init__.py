"""Native (C++) host-side fast path: build-on-first-use ctypes library.

The reference implements its CPU dequant layer in Rust with hand-written
SIMD (/root/reference/src/tensor/quant/*, src/backend/cpu/simd.rs); in the
TPU framework the equivalent native component accelerates the model-LOAD
path: bulk block dequantization of mmapped GGUF data (the decode path runs
in Pallas on the TPU, so no host SIMD is needed there — SURVEY.md §2.2 item
3). Compiled lazily with g++ (-O3 -march=native -fopenmp) into a cached .so
and loaded via ctypes; every caller falls back to the numpy implementation
when the toolchain is unavailable. Set LLAMA_GGUF_NO_NATIVE=1 to disable.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "src" / "dequant.cpp"
_LIB = None
_TRIED = False

# block bytes / elements per block for the natively-supported formats
NATIVE_FORMATS = {
    "Q4_0": ("dequant_q4_0", 18, 32),
    "Q4_1": ("dequant_q4_1", 20, 32),
    "Q5_0": ("dequant_q5_0", 22, 32),
    "Q5_1": ("dequant_q5_1", 24, 32),
    "Q8_0": ("dequant_q8_0", 34, 32),
    "Q4_K": ("dequant_q4_k", 144, 256),
    "Q5_K": ("dequant_q5_k", 176, 256),
    "Q6_K": ("dequant_q6_k", 210, 256),
    "Q8_K": ("dequant_q8_k", 292, 256),
}


_BUILD_FLAGS = b"v2:ffp-contract=off"


def _cache_path() -> Path:
    src = _SRC.read_bytes() + _BUILD_FLAGS
    tag = hashlib.sha256(src).hexdigest()[:16]
    d = Path(os.environ.get("LLAMA_GGUF_NATIVE_CACHE",
                            os.path.join(tempfile.gettempdir(),
                                         "llama_gguf_tpu_native")))
    d.mkdir(parents=True, exist_ok=True)
    return d / f"dequant_{tag}.so"


def _build(out: Path) -> bool:
    # -ffp-contract=off: no FMA contraction, so results are bit-exact with
    # the numpy reference kernels (same rounding per operation)
    cmds = [
        ["g++", "-O3", "-march=native", "-ffp-contract=off", "-fopenmp",
         "-shared", "-fPIC", str(_SRC), "-o", str(out)],
        # fallback without OpenMP / march
        ["g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC", str(_SRC),
         "-o", str(out)],
    ]
    for cmd in cmds:
        try:
            r = subprocess.run(cmd, capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
            log.debug("native build failed: %s", r.stderr.decode()[:500])
        except (OSError, subprocess.TimeoutExpired) as e:
            log.debug("native build error: %s", e)
    return False


def load_library():
    """The ctypes library, building it on first use; None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("LLAMA_GGUF_NO_NATIVE"):
        return None
    try:
        so = _cache_path()
        if not so.exists():
            if not _build(so):
                log.info("native dequant unavailable (g++ build failed); "
                         "using numpy fallback")
                return None
        lib = ctypes.CDLL(str(so))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        for fn, _, _ in NATIVE_FORMATS.values():
            getattr(lib, fn).argtypes = [u8p, f32p, ctypes.c_int64]
            getattr(lib, fn).restype = None
        for fn in ("f16_to_f32_buf", "bf16_to_f32_buf"):
            getattr(lib, fn).argtypes = [u8p, f32p, ctypes.c_int64]
            getattr(lib, fn).restype = None
        lib.native_num_threads.restype = ctypes.c_int
        _LIB = lib
        log.info("native dequant loaded (%d threads)",
                 lib.native_num_threads())
    except Exception as e:  # noqa: BLE001 — any failure means fallback
        log.info("native dequant unavailable: %s", e)
        _LIB = None
    return _LIB


def available() -> bool:
    return load_library() is not None


def dequantize_native(raw: np.ndarray | bytes | memoryview,
                      type_name: str) -> np.ndarray | None:
    """Dequantize raw block bytes with the native kernel; None if the format
    is unsupported or the library is unavailable."""
    spec = NATIVE_FORMATS.get(type_name)
    lib = load_library()
    if spec is None or lib is None:
        return None
    fn_name, block_bytes, block_elems = spec
    arr = np.frombuffer(raw, np.uint8) if not isinstance(raw, np.ndarray) \
        else np.ascontiguousarray(raw, np.uint8)
    if arr.nbytes % block_bytes:
        return None
    nblocks = arr.nbytes // block_bytes
    out = np.empty(nblocks * block_elems, np.float32)
    getattr(lib, fn_name)(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(nblocks),
    )
    return out
