#!/usr/bin/env python3
"""Second-round sort microbenchmarks at the REAL master-class shape
(35.6M elements x 4 uint32 operands, num_keys=4 baseline): comparator
width, stability cost, LSD word passes, and batched row sorts — the
numbers that decide the fast-sort design (VERDICT r3 task 3)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/khoice-jax")

import numpy as np

ITERS = 4
REPS = 3
N = 35651584  # 2 * 16.8M + pad: the doubled-text element count


def timed(fn, *args):
    np.asarray(fn(*args))
    best = 1e9
    for _ in range(REPS):
        t0 = time.time()
        np.asarray(fn(*args))
        best = min(best, time.time() - t0)
    return best / ITERS


def main():
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

    def srt(nk, stable):
        def body(a, b, c, d):
            return jax.lax.sort([a, b, c, d], num_keys=nk, is_stable=stable)
        return body

    t = timed(chain(srt(4, False)), *ws)
    print(f"flat 35.6M 4ops nk4 unstable        : {t*1e3:7.2f} ms   <- current master sort")
    t = timed(chain(srt(3, False)), *ws)
    print(f"flat 35.6M 4ops nk3 unstable        : {t*1e3:7.2f} ms")
    t = timed(chain(srt(2, False)), *ws)
    print(f"flat 35.6M 4ops nk2 unstable        : {t*1e3:7.2f} ms")
    t = timed(chain(srt(1, False)), *ws)
    print(f"flat 35.6M 4ops nk1 unstable        : {t*1e3:7.2f} ms")
    t = timed(chain(srt(1, True)), *ws)
    print(f"flat 35.6M 4ops nk1 stable          : {t*1e3:7.2f} ms")
    t = timed(chain(srt(3, True)), *ws)
    print(f"flat 35.6M 4ops nk3 stable          : {t*1e3:7.2f} ms")

    # LSD two-pass: stable nk1 on word3, then stable nk3 on words0-2
    def body_lsd(a, b, c, d):
        d2, a2, b2, c2 = jax.lax.sort([d, a, b, c], num_keys=1, is_stable=True)
        return jax.lax.sort([a2, b2, c2, d2], num_keys=3, is_stable=True)
    t = timed(chain(body_lsd), *ws)
    print(f"LSD: stable nk1(w3) + stable nk3    : {t*1e3:7.2f} ms")

    # u64 repack: 2 ops of u64, nk2 (same 128 bits)
    if jax.config.jax_enable_x64:
        print("x64 already on")
    def body_u64(a, b, c, d):
        hi = (a.astype(jnp.uint64) << 32) | b.astype(jnp.uint64)
        lo = (c.astype(jnp.uint64) << 32) | d.astype(jnp.uint64)
        s = jax.lax.sort([hi, lo], num_keys=2, is_stable=False)
        return (s[0].astype(jnp.uint32),)
    try:
        with jax.experimental.enable_x64():
            t = timed(chain(body_u64), *ws)
            print(f"u64 repack 2ops nk2 unstable        : {t*1e3:7.2f} ms")
    except Exception as e:
        print(f"u64 repack failed: {e!r}")

    # batched row sorts, 4 ops nk4 (need for local-run phase of merge sort)
    for rows in [544, 2176, 8704]:
        cols = N // rows
        if rows * cols != N:
            continue
        def body_rows(a, b, c, d, rows=rows, cols=cols):
            s = jax.lax.sort(
                [w.reshape(rows, cols) for w in (a, b, c, d)],
                dimension=1, num_keys=4, is_stable=False)
            return (s[0].reshape(-1), )
        t = timed(chain(body_rows), *ws)
        print(f"row sort [{rows:5d},{cols:7d}] 4ops nk4 : {t*1e3:7.2f} ms")

    # pure HBM pass cost for calibration: elementwise copy of 4 ops
    def body_copy(a, b, c, d):
        return (a + 1, b + 1, c + 1, d + 1)
    t = timed(chain(body_copy), *ws)
    print(f"elementwise pass (4 ops r+w)        : {t*1e3:7.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
