#!/usr/bin/env python3
"""Decompose fast_sort cost at the real master shape vs flat nk4."""

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
    import jax
    import jax.numpy as jnp
    from khoice_tpu.engine.fastsort import WINDOW, _lex_gt, _window_pass, fast_sort

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
    print(f"flat nk4 (reference)        : {t*1e3:7.2f} ms")

    t = timed(chain(lambda *w: fast_sort(tuple(w), 4)), *ws)
    print(f"fast_sort total             : {t*1e3:7.2f} ms")

    def p1(*w):
        return jax.lax.sort(list(w), num_keys=1, is_stable=False)
    t = timed(chain(p1), *ws)
    print(f"pass1 nk1 4ops              : {t*1e3:7.2f} ms")

    t = timed(chain(lambda *w: _window_pass(tuple(w), 4, 0, WINDOW)), *ws)
    print(f"window pass aligned W=4096  : {t*1e3:7.2f} ms")

    t = timed(chain(lambda *w: _window_pass(tuple(w), 4, WINDOW // 2, WINDOW)), *ws)
    print(f"window pass offset W=4096   : {t*1e3:7.2f} ms")

    def chk(*w):
        a = tuple(x[:-1] for x in w)
        b = tuple(x[1:] for x in w)
        bad = jnp.any(_lex_gt(a, b))
        return (jnp.where(bad, w[0], w[1]),)
    t = timed(chain(chk), *ws)
    print(f"sorted check (slice)        : {t*1e3:7.2f} ms")

    # does the guard fire on random data? run on actual sweep elements
    from khoice_tpu.engine.ksweep import _extract_fwd_sweep, PACK_NIO_BITS, PACK_GID_BITS
    from khoice_tpu.engine.fastsort import sentinel_encode_packed
    from khoice_tpu.engine.occurrence import pack_members

    members = [rng.integers(0, 4, size=1 << 21, dtype=np.uint8) for _ in range(8)]
    codes, gids = pack_members(members)
    cj, gj = jnp.asarray(codes), jnp.asarray(gids)

    @jax.jit
    def elems_of(codes, gids):
        rc = jnp.where(codes < 4, codes ^ 3, codes)[::-1]
        fwd, _ = _extract_fwd_sweep(
            jnp.concatenate([codes, rc]), jnp.concatenate([gids, gids[::-1]]),
            49, 4, packed=True)
        e, inv = sentinel_encode_packed(fwd, 4, PACK_NIO_BITS, PACK_GID_BITS)
        return e, inv

    e, inv = elems_of(cj, gj)

    @jax.jit
    def guard_fires(e, inv):
        s = tuple(jax.lax.sort(list(e), num_keys=1, is_stable=False))
        s = _window_pass(s, 4, 0, WINDOW)
        s = _window_pass(s, 4, WINDOW // 2, WINDOW)
        prev = tuple(jnp.roll(x, 1) for x in s[:4])
        n_bad = jnp.sum(_lex_gt(prev, s[:4]).at[0].set(False).astype(jnp.int32))
        return n_bad
    print(f"guard violations on sweep elements: {int(guard_fires(e, inv))}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
