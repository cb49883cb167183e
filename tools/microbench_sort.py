#!/usr/bin/env python3
"""Microbenchmarks informing the sort-kernel design: XLA flat sort vs
batched row sort vs scatter/gather at 16.8M elements on the TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/khoice-jax")

import numpy as np

ITERS = 4
REPS = 3


def timed(fn, *args):
    np.asarray(fn(*args))  # compile + sync (block_until_ready is unreliable on axon)
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

    N = 1 << 24  # 16.8M
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))

    def chain(body):
        @jax.jit
        def f(x, y):
            def it(i, carry):
                x, y, acc = carry
                r = body(x ^ acc, y)
                return (x, y, r[0][0] if isinstance(r, (tuple, list)) else r[0])
            _, _, acc = jax.lax.fori_loop(0, ITERS, it, (x, y, jnp.uint32(0)))
            return acc
        return f

    t = timed(chain(lambda x, y: jax.lax.sort([x, y], num_keys=2, is_stable=False)), a, b)
    print(f"flat sort 16.8M 2w num_keys=2     : {t*1e3:7.2f} ms")

    t = timed(chain(lambda x, y: jax.lax.sort([x, y], num_keys=1, is_stable=False)), a, b)
    print(f"flat sort 16.8M 2 ops num_keys=1  : {t*1e3:7.2f} ms")

    t = timed(chain(lambda x, y: jax.lax.sort([x], num_keys=1, is_stable=False)), a, b)
    print(f"flat sort 16.8M 1 op              : {t*1e3:7.2f} ms")

    for rows in [64, 256, 1024, 4096]:
        cols = N // rows
        ar = a.reshape(rows, cols)
        br = b.reshape(rows, cols)

        def body(x, y, rows=rows, cols=cols):
            s = jax.lax.sort([x.reshape(rows, cols), y.reshape(rows, cols)],
                             dimension=1, num_keys=2, is_stable=False)
            return (s[0].reshape(-1), s[1].reshape(-1))
        t = timed(chain(body), a, b)
        print(f"row sort [{rows:5d},{cols:7d}] 2w    : {t*1e3:7.2f} ms")

    @jax.jit
    def gath(x, p):
        def it(i, acc):
            return acc + jnp.take(x, p ^ (acc & 1).astype(p.dtype), mode='clip')[0]
        return jax.lax.fori_loop(0, ITERS, it, jnp.uint32(0))
    t = timed(lambda x, p: gath(x, p), a, perm)
    print(f"gather 16.8M random u32           : {t*1e3:7.2f} ms")

    @jax.jit
    def scat(x, p):
        def it(i, acc):
            r = jnp.zeros_like(x).at[p ^ (acc & 1).astype(p.dtype)].set(x, unique_indices=True)
            return acc + r[0]
        return jax.lax.fori_loop(0, ITERS, it, jnp.uint32(0))
    t = timed(lambda x, p: scat(x, p), a, perm)
    print(f"scatter 16.8M random u32 unique   : {t*1e3:7.2f} ms")

    # sorted-ish gather (locality): perm = almost-identity
    perm2 = jnp.asarray((np.arange(N, dtype=np.int64) ^ 255).astype(np.int32))
    t = timed(lambda x, p: gath(x, p), a, perm2)
    print(f"gather 16.8M local (xor 255)      : {t*1e3:7.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
