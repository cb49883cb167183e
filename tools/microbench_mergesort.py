#!/usr/bin/env python3
"""Decompose the Pallas merge-path sort cost at the master-sweep shape.

Round-5 sort fight (VERDICT r4 #1): measures, on the real chip, each
lever named by the round-4 status note — local run length (level count),
tile size, co-rank cost, per-level kernel cost — against the flat
lax.sort reference. Usage: python tools/microbench_mergesort.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/khoice-jax")

import numpy as np

ITERS = 4
REPS = 3
N = 35651584


def timed(fn, *args):
    np.asarray(fn(*args))
    best = 1e9
    for _ in range(REPS):
        t0 = time.time()
        np.asarray(fn(*args))
        best = min(best, time.time() - t0)
    return best / ITERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
          for _ in range(4)]

    def chain(body):
        @jax.jit
        def f(a, b, c, d):
            def it(i, carry):
                a, b, c, d, acc = carry
                r = body(a ^ acc, b, c, d)
                return (a, b, c, d, r[0][0])
            *_, acc = jax.lax.fori_loop(0, ITERS, it, (a, b, c, d, jnp.uint32(0)))
            return acc
        return f

    t = timed(chain(lambda *w: jax.lax.sort(list(w), num_keys=4, is_stable=False)), *ws)
    print(f"flat nk4 (reference)            : {t*1e3:7.2f} ms")

    # local row-sort phase across run lengths (levels = ceil(log2(N/row)))
    import math
    for row in (8192, 16384, 65536, 131072, 262144, 524288):
        def rs(*w, row=row):
            return jax.lax.sort(
                [x.reshape(N // row, row) for x in w],
                dimension=1, num_keys=4, is_stable=False,
            )
        t = timed(chain(lambda *w, row=row: tuple(
            x.reshape(-1) for x in rs(*w, row=row))), *ws)
        lv = math.ceil(math.log2(N // row))
        print(f"row sort [{N//row:5d}, {row:6d}]      : {t*1e3:7.2f} ms"
              f"  (-> {lv} merge levels)")

    from khoice_tpu.kernels.merge_pallas import merge_sort

    for row in (8192, 65536):
        t = timed(chain(lambda *w, row=row: merge_sort(w, 4, row_len=row)), *ws)
        print(f"merge_sort row_len={row:6d}       : {t*1e3:7.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
