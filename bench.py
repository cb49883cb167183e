#!/usr/bin/env python3
"""Headline benchmark: canonical k-mers/s/chip over the reference k grid.

Sweeps the reference's full 30-point k grid (k=7..30 step 1 and 34..49
step 3, workflow/Snakefile:36) running the fused exp1 inner operation per
k — canonical counting, genome-occurrence reduction and occurrence
histogram over an 8-genome group of 16.8 Mbp — i.e. the work of the
reference's `kmc` count per genome + `kmc_tools complex` union +
`histogram` chain per (k, group)
(workflow/rules/exp_type_1.smk:156-191), on one chip, steady-state.

Methodology: the shared-sort k-sweep (engine/ksweep.py) computes every k
of a key-word class from ONE doubled-text device sort plus a multi-k
Pallas scan — one compile and one sort per class instead of per k; classes
too small to share fall back to the per-k fused path. Each class is one
device call returning only small histograms, so the number reflects
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

    from khoice_tpu.engine.ksweep import occurrence_histograms_sweep_packed
    from khoice_tpu.engine.occurrence import pack_members

    rng = np.random.default_rng(0)
    members = [
        rng.integers(0, 4, size=GENOME_LEN, dtype=np.uint8)
        for _ in range(N_GENOMES)
    ]
    codes, gids = pack_members(members)
    cj, gj = jnp.asarray(codes), jnp.asarray(gids)

    def run_grid():
        return occurrence_histograms_sweep_packed(
            (cj, gj), N_GENOMES, K_GRID, cs=5000, cx=16
        )

    hists = run_grid()  # compile
    chk = sum(hists[k][0] for k in K_GRID)

    n_kmers_total = len(K_GRID) * N_GENOMES * GENOME_LEN
    times = []
    for _ in range(REPS):
        t0 = time.time()
        run_grid()
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
