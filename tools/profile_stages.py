#!/usr/bin/env python3
"""Per-stage device-time breakdown of the fused occurrence step.

Times each stage of engine/occurrence.py's gid-packed fused path
(extract -> pack -> sort -> occ-scan+hist) as its own chained jit
(fori_loop inside one jit, scalar fetch) so the axon tunnel's dispatch
latency doesn't pollute the numbers. Informs the sort-kernel work
(VERDICT round-1 item 1/8).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/khoice-jax")

import numpy as np

N_GENOMES = 8
GENOME_LEN = 1 << 21
REPS = 3
ITERS = 4


def timed(fn, *args):
    r = fn(*args)
    np.asarray(r)  # compile + sync
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

    from khoice_tpu.engine.occurrence import (
        GID_BITS,
        _extract_canonical_dyn,
        _pack_gid_words,
        _packed_occ,
        kmax_class_packed,
        occ_words_packed,
        pack_members,
    )
    from khoice_tpu.kernels.occ_scan_pallas import occ_hist_packed_pallas

    rng = np.random.default_rng(0)
    members = [rng.integers(0, 4, size=GENOME_LEN, dtype=np.uint8)
               for _ in range(N_GENOMES)]
    codes, gids = pack_members(members)
    cj, gj = jnp.asarray(codes), jnp.asarray(gids)
    n = codes.shape[0]
    print(f"n = {n} codes ({n/1e6:.1f}M), genomes={N_GENOMES}")

    for k in [13, 21, 31, 40]:
        km = kmax_class_packed(k)
        w = occ_words_packed(km)

        @jax.jit
        def extract_only(c, g, ks):
            def body(i, acc):
                keys, valid = _extract_canonical_dyn(c, ks[i], km, w)
                packed = _pack_gid_words(keys, valid, g, w)
                return acc + packed[0][0]
            return jax.lax.fori_loop(0, ITERS, body, jnp.uint32(0))

        @jax.jit
        def extract_sort(c, g, ks):
            def body(i, acc):
                keys, valid = _extract_canonical_dyn(c, ks[i], km, w)
                packed = _pack_gid_words(keys, valid, g, w)
                sp = jax.lax.sort(list(packed), num_keys=w, is_stable=False)
                return acc + sp[0][0]
            return jax.lax.fori_loop(0, ITERS, body, jnp.uint32(0))

        @jax.jit
        def full_xla(c, g, ks):
            def body(i, acc):
                keys, valid = _extract_canonical_dyn(c, ks[i], km, w)
                packed = _pack_gid_words(keys, valid, g, w)
                sp = tuple(jax.lax.sort(list(packed), num_keys=w, is_stable=False))
                occ = _packed_occ(sp, 5000, w)
                bins = [jnp.sum((occ == b).astype(jnp.int32)) for b in range(1, N_GENOMES + 1)]
                return acc + jnp.stack(bins)[0].astype(jnp.uint32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.uint32(0))

        @jax.jit
        def full_pallas(c, g, ks):
            def body(i, acc):
                keys, valid = _extract_canonical_dyn(c, ks[i], km, w)
                packed = _pack_gid_words(keys, valid, g, w)
                sp = tuple(jax.lax.sort(list(packed), num_keys=w, is_stable=False))
                small = occ_hist_packed_pallas(sp, N_GENOMES, GID_BITS)
                return acc + small[0].astype(jnp.uint32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.uint32(0))

        kk = jnp.full((ITERS,), k, jnp.uint32)
        t_ex = timed(extract_only, cj, gj, kk)
        t_exs = timed(extract_sort, cj, gj, kk)
        t_xla = timed(full_xla, cj, gj, kk)
        t_pal = timed(full_pallas, cj, gj, kk)
        rate = N_GENOMES * GENOME_LEN / t_pal / 1e6
        print(f"k={k:2d} (class {km}, {w} words): extract={t_ex*1e3:7.2f}ms  "
              f"sort={1e3*(t_exs-t_ex):7.2f}ms  scan_xla={1e3*(t_xla-t_exs):7.2f}ms  "
              f"scan_pallas={1e3*(t_pal-t_exs):7.2f}ms  total={t_pal*1e3:7.2f}ms  "
              f"({rate:.0f} Mkmer/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
