"""Decision-boundary grid: enumeration of the T-lattice on the simplex.

The verification sweep evaluates the Lyapunov decrease condition on every
lattice point h in (Z/T)^n with sum(h) = 1 and h_label == max wrong prob
(reference robustness/eval_utils.py:31-89 — a Python DP that is the CPU-hot
step of grid generation; and sample_decision_boundary.py's per-label column
swap at eval_utils.py:64-69).

Here the enumeration core is native C++ (native/grid_enum.cpp, built on
demand with g++ -O3 and loaded over ctypes) with a pure-NumPy fallback.
"""
from __future__ import annotations

import ctypes
import subprocess
from functools import lru_cache
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = [
    "count_decision_boundary",
    "enumerate_decision_boundary",
    "grid_for_label",
]

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"


@lru_cache(maxsize=1)
def _load_native() -> Optional[ctypes.CDLL]:
    src = _NATIVE_DIR / "grid_enum.cpp"
    so = _NATIVE_DIR / "libgrid_enum.so"
    if not src.exists():
        return None
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(so), str(src)],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.count_boundary.restype = ctypes.c_int64
    lib.count_boundary.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.enum_boundary.restype = ctypes.c_int64
    lib.enum_boundary.argtypes = [
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int16),
    ]
    return lib


def _count_py(n: int, T: int) -> int:
    """Counting oracle: sum over the tied max m of
    #(bounded compositions of T-m into n-1 parts with max exactly m)."""

    from functools import lru_cache as _lru

    @_lru(maxsize=None)
    def comps_le(k: int, s: int, m: int) -> int:
        if s < 0 or m * k < s:
            return 0
        if k == 0:
            return 1 if s == 0 else 0
        return sum(comps_le(k - 1, s - v, m) for v in range(min(m, s) + 1))

    total = 0
    for m in range(T + 1):
        le_m = comps_le(n - 1, T - m, m)
        le_m1 = comps_le(n - 1, T - m, m - 1) if m > 0 else 0
        total += le_m - le_m1
    return total


def _enum_py(n: int, T: int) -> np.ndarray:
    rows = []
    cur = np.zeros(n, np.int16)

    def rec(pos, remaining, m, used_m):
        left = n - pos
        if left == 0:
            if remaining == 0 and used_m:
                rows.append(cur.copy())
            return
        if remaining < 0 or m * left < remaining:
            return
        if not used_m and remaining < m:
            return
        for v in range(min(m, remaining) + 1):
            cur[pos] = v
            rec(pos + 1, remaining - v, m, used_m or v == m)
        cur[pos] = 0

    for m in range(T + 1):
        cur[0] = m
        rec(1, T - m, m, False)
    return np.stack(rows) if rows else np.zeros((0, n), np.int16)


def count_decision_boundary(n: int = 10, T: int = 40) -> int:
    lib = _load_native()
    if lib is not None:
        return int(lib.count_boundary(n, T))
    return _count_py(n, T)


def enumerate_decision_boundary(n: int = 10, T: int = 40) -> np.ndarray:
    """All lattice points, float32 (count, n), coordinates summing to 1,
    with coordinate 0 playing the label role (tied max)."""
    lib = _load_native()
    if lib is not None:
        cnt = int(lib.count_boundary(n, T))
        out = np.zeros((cnt, n), np.int16)
        written = lib.enum_boundary(
            n, T, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
        )
        assert written == cnt, (written, cnt)
        grid = out
    else:
        grid = _enum_py(n, T)
    return grid.astype(np.float32) / T


def grid_for_label(grid: np.ndarray, label: int) -> np.ndarray:
    """Swap coordinate 0 with ``label`` (reference eval_utils.py:64-69)."""
    g = grid.copy()
    if label != 0:
        g[:, [label, 0]] = g[:, [0, label]]
    return g
