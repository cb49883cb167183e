#!/usr/bin/env python3
"""Headline benchmark: canonical k-mers/s/chip on counting + set-ops.

Runs the fused exp1 inner operation — canonical 31-mer extraction, the
(key, genome_id) sort, genome-occurrence reduction and occurrence
histogram over an 8-genome group of 16.8 Mbp total — i.e. the work of the
reference's `kmc` count per genome + `kmc_tools complex` union +
`histogram` chain per (k, group) (workflow/rules/exp_type_1.smk:156-191),
on one chip, steady-state. The step is chained inside one jit (fori_loop)
and only a scalar is fetched, so the number reflects device time, not the
axon tunnel's ~20ms dispatch/fetch latency.

Baseline: the reference publishes no numbers (BASELINE.md) and KMC3 cannot
be installed here (zero egress). vs_baseline is computed against 150M
canonical k-mers/s — a representative KMC3 multithreaded single-node
*counting-only* rate derived from the KMC3 paper's reported wall-clocks
(arXiv:1701.08022; see PAPERS.md) — conservative, since the reference
additionally pays the kmc_tools union/histogram passes included here.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/khoice-jax")

import numpy as np

KMC3_BASELINE_KMERS_PER_S = 150e6
K = 31
N_GENOMES = 8
GENOME_LEN = 1 << 21  # 8 x 2 Mbp = 16.8M k-mers per step
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from khoice_tpu.engine.bits import key_words
    from khoice_tpu.engine.occurrence import (
        _occurrence_histogram_dyn,
        _occurrence_histogram_dyn_pallas,
        _pallas_ok,
        kmax_class,
        pack_members,
    )

    rng = np.random.default_rng(0)
    members = [
        rng.integers(0, 4, size=GENOME_LEN, dtype=np.uint8)
        for _ in range(N_GENOMES)
    ]
    codes, gids = pack_members(members)
    n_kmers = N_GENOMES * GENOME_LEN
    km = kmax_class(K)
    w = key_words(km)
    cj, gj = jnp.asarray(codes), jnp.asarray(gids)
    fn = (
        _occurrence_histogram_dyn_pallas
        if _pallas_ok(codes.shape[0], N_GENOMES)
        else _occurrence_histogram_dyn
    )

    @jax.jit
    def rep(c, g):
        def body(i, acc):
            h = fn(
                ((c + i.astype(jnp.uint8)) % 5, g),
                jnp.uint32(K), km, 5000, 255, w, N_GENOMES,
            )
            return acc + h[0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    chk = int(np.asarray(rep(cj, gj)))  # warmup/compile
    times = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(rep(cj, gj))
        times.append(time.time() - t0)
    per_iter = min(times) / ITERS
    kmers_per_s = n_kmers / per_iter

    print(json.dumps({
        "metric": "canonical_kmers_per_s_per_chip_count_union_hist",
        "value": round(kmers_per_s / 1e6, 1),
        "unit": "Mkmer/s",
        "vs_baseline": round(kmers_per_s / KMC3_BASELINE_KMERS_PER_S, 2),
    }))
    return 0 if chk != 0 else 1


if __name__ == "__main__":
    sys.exit(main())
