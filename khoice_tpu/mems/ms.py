"""Matching statistics + MEM locate, backed by the native C++ engine.

Replaces SPUMONI (`spumoni build -M -n` / `run -M -n` producing per-base
matching statistics, reference exp_type_5.smk:115-133) and the r-index's
`ri-align -m 1 locate` one-best-hit queries (exp_type_7.smk:244-256).
The shared library is compiled from khoice_tpu/native/ms_engine.cpp on
first use (g++ is in the image; pybind11 is not, so the binding is ctypes
over a C ABI). A pure-Python fallback keeps tests runnable anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        src = os.path.abspath(os.path.join(_NATIVE_DIR, "ms_engine.cpp"))
        cache = os.environ.get(
            "KHOICE_NATIVE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "khoice-native"),
        )
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, "libkhoice_ms.so")
        try:
            if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", src, "-o", so + ".tmp"],
                    check=True,
                    capture_output=True,
                )
                os.replace(so + ".tmp", so)
            lib = ctypes.CDLL(so)
            lib.ms_build.restype = ctypes.c_void_p
            lib.ms_build.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            lib.ms_free.argtypes = [ctypes.c_void_p]
            lib.ms_query.argtypes = [
                ctypes.c_void_p,
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.ms_locate.restype = ctypes.c_int64
            lib.ms_locate.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
            lib.ms_text_len.restype = ctypes.c_int64
            lib.ms_text_len.argtypes = [ctypes.c_void_p]
            lib.ms_batch.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
            ]
            _LIB = lib
        except Exception:
            _LIB_FAILED = True
        return _LIB


class MatchingStatisticsIndex:
    """Index over a reference text supporting per-base matching statistics
    and exact-pattern locate."""

    def __init__(self, text: str):
        self._text = text
        self._lib = _build_lib()
        self._handle = None
        if self._lib is not None:
            data = text.encode("ascii")
            self._handle = ctypes.c_void_p(
                self._lib.ms_build(data, len(data))
            )
        else:  # pure-Python fallback: sorted suffix list (small inputs only)
            self._suffixes = sorted(range(len(text)), key=lambda i: text[i:])

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.ms_free(self._handle)
            self._handle = None

    def matching_statistics(self, query: str) -> np.ndarray:
        """MS[i] = length of the longest prefix of query[i:] in the text
        (the `.lengths` row SPUMONI emits per read)."""
        m = len(query)
        if self._handle is not None:
            out = np.zeros(m, np.int32)
            self._lib.ms_query(
                self._handle,
                query.encode("ascii"),
                m,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return out
        return np.array(
            [self._py_longest_prefix(query[i:])[0] for i in range(m)], np.int32
        )

    def locate(self, pattern: str) -> int:
        """First text position of an exact full match, or -1 (-m 1 role)."""
        if self._handle is not None:
            return int(
                self._lib.ms_locate(
                    self._handle, pattern.encode("ascii"), len(pattern)
                )
            )
        l, pos = self._py_longest_prefix(pattern)
        return pos if l == len(pattern) else -1

    def contains(self, pattern: str) -> bool:
        return self.locate(pattern) >= 0

    def batch_matching_statistics(self, reads: List[str]) -> List[np.ndarray]:
        """Matching statistics for a whole read set in one pass.

        Uses the native generalized-suffix-array batch path — one SA over
        text++reads with unique boundary separators, a Kasai LCP pass and
        two linear sweeps — O((n+m) log(n+m)) TOTAL instead of per-position
        restart queries (the SPUMONI `run -M -n` workload shape: GB-scale
        reference, 10k reads, exp_type_5.smk:115-133).  Falls back to
        per-read queries when the native library is unavailable.
        """
        if not reads:
            return []
        if self._lib is None or not hasattr(self._lib, "ms_batch"):
            return [self.matching_statistics(r) for r in reads]
        concat = "".join(reads).encode("ascii")
        offs = np.zeros(len(reads) + 1, np.int64)
        np.cumsum([len(r) for r in reads], out=offs[1:])
        out = np.zeros(int(offs[-1]), np.int32)
        text = self._text.encode("ascii")
        self._lib.ms_batch(
            text,
            len(text),
            concat,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(reads),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return [out[offs[i] : offs[i + 1]].copy() for i in range(len(reads))]

    def _py_longest_prefix(self, q: str):
        """(longest matched prefix length, a position matching it)."""
        text = self._text
        sufs = self._suffixes
        lo, hi, l = 0, len(sufs), 0
        while l < len(q):
            c = q[l]

            def char_at(s):
                p = s + l
                return text[p] if p < len(text) else "\0"

            a, b = lo, hi
            while a < b:  # lower bound: char_at >= c
                mid = (a + b) // 2
                if char_at(sufs[mid]) < c:
                    a = mid + 1
                else:
                    b = mid
            new_lo = a
            b = hi
            while a < b:  # upper bound: char_at > c
                mid = (a + b) // 2
                if char_at(sufs[mid]) <= c:
                    a = mid + 1
                else:
                    b = mid
            new_hi = a
            if new_lo >= new_hi:
                break
            lo, hi, l = new_lo, new_hi, l + 1
        return l, (sufs[lo] if lo < len(sufs) else -1)
