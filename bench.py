#!/usr/bin/env python3
"""Headline benchmark: canonical k-mers/s/chip over the reference k grid.

Sweeps the reference's full 30-point k grid (k=7..30 step 1 and 34..49
step 3, workflow/Snakefile:36) running the fused exp1 inner operation per
k — canonical extraction, the gid-packed (key, genome_id) sort, genome-
occurrence reduction and occurrence histogram over an 8-genome group of
16.8 Mbp — i.e. the work of the reference's `kmc` count per genome +
`kmc_tools complex` union + `histogram` chain per (k, group)
(workflow/rules/exp_type_1.smk:156-191), on one chip, steady-state.

Methodology: ks are grouped by packed word-width class (one XLA compile
per class); each class's ks are swept INSIDE one jit (fori_loop over a
traced k array) and only a scalar is fetched, so the number reflects
device time, not the axon tunnel's ~20ms dispatch/fetch latency. Rate =
total k-mers across the whole grid / best total sweep time.

Baseline: the reference publishes no numbers (BASELINE.md) and KMC3
cannot be installed here (zero egress). vs_baseline is computed against
150M canonical k-mers/s — a representative KMC3 multithreaded single-node
*counting-only* rate derived from the KMC3 paper's reported wall-clocks
(arXiv:1701.08022; see PAPERS.md) — conservative, since the reference
additionally re-reads input per k and pays the kmc_tools union/histogram
passes included here.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/khoice-jax")

import numpy as np

KMC3_BASELINE_KMERS_PER_S = 150e6
N_GENOMES = 8
GENOME_LEN = 1 << 21  # 8 x 2 Mbp = 16.8M k-mers per grid point
K_GRID = list(range(7, 31)) + [34, 37, 40, 43, 46, 49]  # Snakefile:36
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from khoice_tpu.engine.occurrence import (
        _occurrence_histogram_dyn_packed,
        _occurrence_histogram_dyn_packed_pallas,
        _pallas_ok,
        kmax_class_packed,
        occ_words_packed,
        pack_members,
    )

    rng = np.random.default_rng(0)
    members = [
        rng.integers(0, 4, size=GENOME_LEN, dtype=np.uint8)
        for _ in range(N_GENOMES)
    ]
    codes, gids = pack_members(members)
    fn = (
        _occurrence_histogram_dyn_packed_pallas
        if _pallas_ok(codes.shape[0], N_GENOMES)
        else _occurrence_histogram_dyn_packed
    )
    cj, gj = jnp.asarray(codes), jnp.asarray(gids)

    by_class = {}
    for k in K_GRID:
        by_class.setdefault(kmax_class_packed(k), []).append(k)

    def make_sweep(km, n_ks):
        w = occ_words_packed(km)

        @jax.jit
        def sweep(c, g, ks):
            def body(i, acc):
                h = fn((c, g), ks[i], km, 5000, 255, w, N_GENOMES)
                return acc + h[0]
            return jax.lax.fori_loop(0, n_ks, body, jnp.int32(0))

        return sweep

    sweeps = {}
    chk = 0
    for km, ks in sorted(by_class.items()):
        sweeps[km] = (make_sweep(km, len(ks)), jnp.asarray(ks, jnp.uint32))
        chk += int(np.asarray(sweeps[km][0](cj, gj, sweeps[km][1])))  # compile

    n_kmers_total = len(K_GRID) * N_GENOMES * GENOME_LEN
    times = []
    for _ in range(REPS):
        t0 = time.time()
        for km in sorted(sweeps):
            sweep, ks = sweeps[km]
            np.asarray(sweep(cj, gj, ks))
        times.append(time.time() - t0)
    kmers_per_s = n_kmers_total / min(times)

    print(json.dumps({
        "metric": "canonical_kmers_per_s_per_chip_kgrid_count_union_hist",
        "value": round(kmers_per_s / 1e6, 1),
        "unit": "Mkmer/s",
        "vs_baseline": round(kmers_per_s / KMC3_BASELINE_KMERS_PER_S, 2),
    }))
    return 0 if chk != 0 else 1


if __name__ == "__main__":
    sys.exit(main())
