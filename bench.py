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
# 8 virtual CPU devices for the labeled scaling row (set before jax init;
# does not affect the TPU backend)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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

    headline = {
        "metric": "canonical_kmers_per_s_per_chip_kgrid_count_union_hist",
        "value": round(kmers_per_s / 1e6, 1),
        "unit": "Mkmer/s",
        "vs_baseline": round(kmers_per_s / KMC3_BASELINE_KMERS_PER_S, 2),
    }
    try:
        protocol = _protocol_rows(cj, gj, headline, run_grid)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_PROTOCOL.json"), "w") as fd:
            json.dump(protocol, fd, indent=1)
    except Exception as e:  # the headline line must survive protocol hiccups
        print(f"[bench] protocol rows failed: {e!r}", file=sys.stderr)

    print(json.dumps(headline))
    return 0 if chk != 0 else 1


def _protocol_rows(cj, gj, headline, run_grid):
    """BASELINE.md measurement-protocol rows -> BENCH_PROTOCOL.json.

    Rows: the 1-chip headline, a per-stage device breakdown
    (extract / sort / multi-k scan of the master class), and the
    multi-chip row — real N>=2-chip hardware is unavailable here, so that
    row reports the 8-virtual-CPU-device SPMD validation (bit-exactness
    vs the single-device sweep) plus the analytic per-device exchange
    volume, clearly labeled as a dryrun, not a measurement.

    All three stage timings are fresh min-of-REPS measurements of nested
    prefixes of ONE pipeline (extract / extract+sort / full grid), so the
    differences are same-methodology and clamped at >= 0.
    """
    import jax
    import jax.numpy as jnp

    from khoice_tpu.engine.ksweep import _extract_fwd_sweep, plan_sweep

    classes, _rem = plan_sweep(K_GRID, N_GENOMES)
    kmax, KW, cks, packed = classes[0]

    @jax.jit
    def extract_ck(codes, gids):
        rc = jnp.where(codes < 4, codes ^ 3, codes)[::-1]
        fwd, _ = _extract_fwd_sweep(
            jnp.concatenate([codes, rc]),
            jnp.concatenate([gids, gids[::-1]]),
            kmax, KW, packed=packed,
        )
        return sum(jnp.sum(w.astype(jnp.uint32)) for w in fwd)

    @jax.jit
    def extract_sort_ck(codes, gids):
        # the real sweep front half: extract + sentinel re-encode +
        # fastsort (engine/ksweep._sweep_doubled), incl. the payload
        # operand when the class is unpacked (ADVICE r3)
        from khoice_tpu.engine.ksweep import _sweep_doubled

        skeys, spay = _sweep_doubled(codes, gids, kmax, KW, packed)
        return skeys[0][::1000].astype(jnp.uint32).sum()

    def best(f):
        f()
        times = []
        for _ in range(REPS):
            t0 = time.time()
            f()
            times.append(time.time() - t0)
        return min(times)

    te = best(lambda: float(extract_ck(cj, gj)))
    tes = best(lambda: float(extract_sort_ck(cj, gj)))
    tf = best(run_grid)
    n2 = 2 * int(cj.shape[0])
    stages = {
        "elements_doubled_text": n2,
        "sort_class": {"kmax": kmax, "key_words": KW, "payload_packed": bool(packed),
                       "ks_served": len(cks)},
        "extract_ms": round(te * 1000, 1),
        "sort_ms": round(max(tes - te, 0.0) * 1000, 1),
        "scan_30ks_ms": round(max(tf - tes, 0.0) * 1000, 1),
        "total_ms": round(tf * 1000, 1),
    }

    # multi-chip: validation row (no >=2-chip hardware behind the tunnel)
    d = 8
    exchange_bytes_per_device = (n2 // d) * (KW + (0 if packed else 1)) * 4
    scaling = {
        "mode": "virtual-cpu-dryrun (multi-chip hardware unavailable)",
        "devices": d,
        "validated": "sharded sweep bit-exact vs single-device "
                     "(tests/test_dist_ksweep.py + __graft_entry__.dryrun_multichip)",
        "all_to_all_bytes_per_device_per_class": exchange_bytes_per_device,
        "measured_efficiency": None,
    }
    try:
        scaling["measured_efficiency"] = _virtual_mesh_scaling()
    except Exception as e:
        print(f"[bench] virtual scaling row failed: {e!r}", file=sys.stderr)
    return {
        "protocol": "BASELINE.md: rates at 1 chip / 1 host / >=2 hosts",
        "one_chip": headline,
        "stage_breakdown": stages,
        "multi_chip": scaling,
    }


def _virtual_mesh_scaling():
    """Timing of the SPMD sweep on 1/2/4/8 VIRTUAL CPU devices — clearly
    labeled as a CPU dryrun, never a TPU hardware claim (no >=2-chip
    hardware exists behind the tunnel; round-3 VERDICT task 8).

    All virtual devices share one host's cores, so the total compute
    throughput is CONSTANT regardless of device count — speedup is not
    measurable here.  What IS measurable is the sharding machinery's
    OVERHEAD at constant work: overhead_d = t_d / t_1 covers the
    split-sampling, rank-space bucketing, all_to_all exchange and psum
    that real multi-chip runs would pay on top of the compute.
    overhead ~ 1.0 means the SPMD path adds almost nothing over the
    single-device sweep at the same total input."""
    import jax

    from khoice_tpu.dist import make_mesh
    from khoice_tpu.dist.ksweep import sharded_occurrence_histograms_sweep

    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        return {"mode": "virtual-cpu-dryrun", "error": "no 8 cpu devices"}
    rng = np.random.default_rng(1)
    members = [
        rng.integers(0, 4, size=1 << 19, dtype=np.uint8) for _ in range(4)
    ]
    ks = [21, 31, 49]  # one packed master class
    times = {}
    with jax.default_device(cpus[0]):
        for nd in (1, 2, 4, 8):
            mesh = make_mesh(devices=cpus[:nd])
            sharded_occurrence_histograms_sweep(mesh, members, ks, cx=8)
            best = 1e9
            for _ in range(2):
                t0 = time.time()
                sharded_occurrence_histograms_sweep(mesh, members, ks, cx=8)
                best = min(best, time.time() - t0)
            times[nd] = best
    return {
        "mode": "virtual-cpu-dryrun (one host's virtual devices share the "
                "same cores: total throughput is constant, so this measures "
                "the SPMD machinery's OVERHEAD at constant work — NOT a TPU "
                "hardware scaling measurement)",
        "input_positions": int(sum(m.shape[0] for m in members)),
        "seconds_by_devices": {str(d): round(t, 3) for d, t in times.items()},
        "sharding_overhead_vs_single": {
            str(d): round(times[d] / times[1], 3) for d in times
        },
    }


if __name__ == "__main__":
    sys.exit(main())
