#!/usr/bin/env python3
"""Shared-sort k-sweep vs per-k fused path on the TPU: exactness + timing
over the reference's 30-point k grid at bench scale (8 x 2 Mbp group)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/khoice-jax")

import numpy as np

N_GENOMES = 8
GENOME_LEN = 1 << 21
K_GRID = list(range(7, 31)) + [34, 37, 40, 43, 46, 49]
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from khoice_tpu.engine.ksweep import (
        _sweep_class_fn,
        _sweep_pallas_ok,
        occurrence_histograms_sweep_packed,
        plan_sweep,
    )
    from khoice_tpu.engine.occurrence import occurrence_histogram_packed, pack_members

    rng = np.random.default_rng(0)
    members = [rng.integers(0, 4, size=GENOME_LEN, dtype=np.uint8)
               for _ in range(N_GENOMES)]
    codes, gids = pack_members(members)
    cj, gj = jnp.asarray(codes), jnp.asarray(gids)
    n2 = 2 * int(codes.shape[0])
    use_pallas = _sweep_pallas_ok(n2, N_GENOMES)
    print(f"n={codes.shape[0]} doubled={n2} pallas={use_pallas}")

    classes, rest = plan_sweep(K_GRID, N_GENOMES)
    assert not rest, rest
    fns = []
    for kmax, KW, cks, packed in classes:
        t0 = time.time()
        out = _sweep_class_fn(cj, gj, cks, kmax, KW, N_GENOMES, 5000, use_pallas, packed)
        np.asarray(out)
        print(f"class kmax={kmax} KW={KW} ks={len(cks)} packed={packed}: compile+run {time.time()-t0:.1f}s")
        fns.append((kmax, KW, cks, packed))

    # timing: per class and total
    total_best = 1e9
    per_class = {}
    for _ in range(REPS):
        t_all = 0.0
        for kmax, KW, cks, packed in fns:
            t0 = time.time()
            np.asarray(_sweep_class_fn(cj, gj, cks, kmax, KW, N_GENOMES, 5000, use_pallas, packed))
            dt = time.time() - t0
            t_all += dt
            per_class[kmax] = min(per_class.get(kmax, 1e9), dt)
        total_best = min(total_best, t_all)
    n_kmers = len(K_GRID) * N_GENOMES * GENOME_LEN
    for kmax, KW, cks, packed in fns:
        print(f"class kmax={kmax}: {per_class[kmax]*1e3:7.1f} ms for {len(cks)} ks "
              f"({len(cks)*N_GENOMES*GENOME_LEN/per_class[kmax]/1e6:.0f} Mkmer/s)")
    print(f"TOTAL grid: {total_best*1e3:.1f} ms = {n_kmers/total_best/1e6:.0f} Mkmer/s "
          f"(vs r1 headline 243)")

    # exactness: sweep vs per-k fused on a few ks
    sw = occurrence_histograms_sweep_packed((cj, gj), N_GENOMES, [7, 12, 25, 30, 40, 46, 49], cx=16)
    for k in [7, 12, 25, 30, 40, 46, 49]:
        want = occurrence_histogram_packed((cj, gj), N_GENOMES, k, cx=16)
        assert sw[k] == want, f"MISMATCH k={k}: {sw[k]} != {want}"
    print("exactness vs per-k fused path: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
