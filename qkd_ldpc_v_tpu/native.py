"""ctypes loader for the native host-side kernel library (native/).

The library is optional: every consumer has a pure-Python fallback producing
bit-identical results (both sides share the SplitMix64 selection RNG). On
first use this module tries, in order:

  1. ``QKDLDPC_NATIVE_LIB`` env var pointing at a built .so,
  2. a previously built ``native/libqkdldpc_native.so`` in the repo,
  3. a quiet one-shot ``make`` build if a C++ toolchain is present.

Failures at any stage degrade silently to the Python implementations.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger("qkd_ldpc_v_tpu")

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_NAME = "libqkdldpc_native.so"

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_build() -> Optional[Path] :
    target = _NATIVE_DIR / _LIB_NAME
    if target.exists():
        return target
    if not (_NATIVE_DIR / "Makefile").exists():
        return None
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except (OSError, subprocess.SubprocessError) as e:
        logger.debug("native build failed (%s); using Python fallbacks", e)
        return None
    return target if target.exists() else None


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True

    candidates = []
    env = os.environ.get("QKDLDPC_NATIVE_LIB")
    if env:
        candidates.append(Path(env))
    built = _try_build()
    if built:
        candidates.append(built)

    for path in candidates:
        try:
            lib = ctypes.CDLL(str(path))
            lib.qkdldpc_untainted_select.restype = ctypes.c_int64
            lib.qkdldpc_untainted_select.argtypes = [
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
            return _lib
        except OSError as e:
            logger.debug("failed to load %s: %s", path, e)
    return None


def untainted_select(
    n2_flat: np.ndarray, offsets: np.ndarray, seed: int
) -> Optional[np.ndarray]:
    """Native greedy untainted selection, or None if the library is absent.

    ``n2_flat``/``offsets`` are the CSR form of the (symmetric) second-order
    neighborhood; ``seed`` feeds the shared SplitMix64 tie-break RNG.
    """
    lib = load()
    if lib is None:
        return None
    n = len(offsets) - 1
    n2_flat = np.ascontiguousarray(n2_flat, dtype=np.int32)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    out = np.empty(n, dtype=np.int32)
    count = lib.qkdldpc_untainted_select(
        ctypes.c_int64(n),
        n2_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out[:count].copy()


def _bind_parse(lib: ctypes.CDLL) -> None:
    if getattr(lib, "_parse_bound", False):
        return
    lib.qkdldpc_parse_ints.restype = ctypes.c_int64
    lib.qkdldpc_parse_ints.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib._parse_bound = True


def parse_int_lines(text: str):
    """Tokenize lines of integers natively; returns a list of lists of ints
    matching the pure-Python `[int(tok) for tok in line.split()]` per
    splitlines() line, or None when the library is absent or the text
    contains a non-integer token (caller falls back for exact error
    messages)."""
    lib = load()
    if lib is None:
        return None
    if not text:
        return []
    _bind_parse(lib)
    raw = text.encode()
    n_lines = ctypes.c_int64(0)
    total = lib.qkdldpc_parse_ints(
        raw, len(raw), None, None, ctypes.byref(n_lines)
    )
    if total < 0:
        return None
    values = np.empty(max(total, 1), dtype=np.int32)
    starts = np.empty(n_lines.value + 1, dtype=np.int64)
    lib.qkdldpc_parse_ints(
        raw, len(raw),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(n_lines),
    )
    vals = values[:total].tolist()
    lines = [
        vals[starts[i]:starts[i + 1]] for i in range(n_lines.value)
    ]
    # splitlines() drops the empty segment after a trailing newline.
    if text.endswith("\n") and lines and not lines[-1]:
        lines.pop()
    return lines
