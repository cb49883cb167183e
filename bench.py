#!/usr/bin/env python3
"""Headline benchmark: canonical k-mers/s/chip on the counting core.

Counts canonical 31-mers (KMC3's `kmc -fm -k31 -ci1` role, reference:
workflow/rules/exp_type_1.smk:163) over a synthetic 16.8 Mbp genome on one
chip, steady-state. The step is chained inside one jit (fori_loop) and only
a checksum scalar is fetched, so the number reflects device time, not the
axon tunnel's ~20ms dispatch/fetch latency.

Baseline: the reference publishes no numbers (BASELINE.md) and KMC3 cannot
be installed here (zero egress). vs_baseline is computed against 150M
canonical k-mers/s — a representative KMC3 multithreaded single-node rate
derived from the KMC3 paper's reported wall-clocks (counting F. vesca /
H. sapiens class datasets; see PAPERS.md, KMC3 arXiv:1701.08022).

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
LOG_N = 24
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from khoice_tpu.engine import ops

    n = 1 << LOG_N
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, size=n, dtype=np.uint8))

    @jax.jit
    def rep(codes):
        def body(i, acc):
            c = (codes + i.astype(jnp.uint8)) & 3
            t = ops.count_codes(c, k=K, cs=255)
            return acc + jnp.sum(t.counts.astype(jnp.int32))
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    # warmup/compile
    chk = int(np.asarray(rep(codes)))
    times = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(rep(codes))
        times.append(time.time() - t0)
    per_iter = min(times) / ITERS
    kmers_per_s = n / per_iter

    print(json.dumps({
        "metric": "canonical_kmers_per_s_per_chip",
        "value": round(kmers_per_s / 1e6, 1),
        "unit": "Mkmer/s",
        "vs_baseline": round(kmers_per_s / KMC3_BASELINE_KMERS_PER_S, 2),
    }))
    return 0 if chk != 0 else 1


if __name__ == "__main__":
    sys.exit(main())
