#!/usr/bin/env python3
"""Bounded-memory streaming demo: an exp1 group LARGER than HBM.

KMC's defining capability is fixed-memory counting of arbitrarily large
inputs (`kmc -m64`, reference exp_type_1.smk:163).  The in-core master
sweep materializes ~16 B/position of sort structures for the doubled
text plus comparable sort workspace, so a single group beyond ~100-150
Mbp exceeds a v5e's 16 GB HBM.  This demo runs
engine/streaming.occurrence_histograms_sweep_streaming on a group
whose in-core footprint provably exceeds HBM, under an explicit device
budget, and prints wall time + device memory stats + the result digest.

Exactness at this scale is established two ways: (1) the streaming path
is bit-identical to the in-core sweep at CPU-checkable sizes
(tests/test_streaming.py, oracle-pinned upstream); (2) here the SAME
input is streamed under two DIFFERENT chunk/group decompositions and
the histograms must match bit-for-bit (self-consistency across
partitions).

Usage: python tools/demo_streaming.py [--mbp-per-member 50]
         [--members 6] [--budget-gb 6] [--ks 7,13,21,31,49]
         [--try-incore]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/khoice-jax")

import numpy as np


def _mem_stats(dev):
    try:
        s = dev.memory_stats() or {}
        return {k: s[k] for k in ("bytes_in_use", "peak_bytes_in_use",
                                  "bytes_limit") if k in s}
    except Exception:
        return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp-per-member", type=float, default=50.0)
    ap.add_argument("--members", type=int, default=6)
    ap.add_argument("--budget-gb", type=float, default=6.0)
    ap.add_argument("--ks", default="7,13,21,31,49")
    ap.add_argument("--try-incore", action="store_true",
                    help="also attempt the in-core sweep (expected OOM)")
    args = ap.parse_args()

    import jax

    from khoice_tpu.engine.streaming import occurrence_histograms_sweep_streaming

    ks = [int(x) for x in args.ks.split(",")]
    n_per = int(args.mbp_per_member * 1e6)
    rng = np.random.default_rng(11)
    core = rng.integers(0, 4, size=n_per // 2, dtype=np.uint8)
    members = []
    for i in range(args.members):
        own = rng.integers(0, 4, size=n_per - core.shape[0], dtype=np.uint8)
        m = np.concatenate([core, own])
        # sprinkle divergence into the shared core region
        pos = rng.integers(0, core.shape[0], size=n_per // 200)
        m[pos] = rng.integers(0, 4, size=pos.shape[0], dtype=np.uint8)
        members.append(m)
    total = sum(m.shape[0] for m in members)
    n2 = 2 * (total + args.members)
    incore_bytes = n2 * 16  # 4 sorted u32 words/element, before workspace
    dev = jax.devices()[0]
    print(f"group: {args.members} x {n_per/1e6:.0f} Mbp = {total/1e6:.0f} Mbp; "
          f"doubled elements {n2/1e6:.0f}M; in-core sort structures ~"
          f"{incore_bytes/2**30:.1f} GiB (+ sort workspace) on a "
          f"{_mem_stats(dev).get('bytes_limit', 0)/2**30:.1f} GiB device")

    if args.try_incore:
        from khoice_tpu.engine.ksweep import occurrence_histograms_sweep

        try:
            t0 = time.time()
            occurrence_histograms_sweep(members, ks, cx=8)
            print(f"in-core sweep unexpectedly SUCCEEDED in {time.time()-t0:.0f}s")
        except Exception as e:
            print(f"in-core sweep failed as expected: {type(e).__name__}: "
                  f"{str(e)[:200]}")

    budget = int(args.budget_gb * 2**30)
    t0 = time.time()
    h1 = occurrence_histograms_sweep_streaming(
        members, ks, cx=8, device_budget_bytes=budget)
    t1 = time.time() - t0
    stats = _mem_stats(dev)
    print(f"streaming run 1: {t1:.0f}s wall, mem {json.dumps(stats)}")

    t0 = time.time()
    h2 = occurrence_histograms_sweep_streaming(
        members, ks, cx=8, device_budget_bytes=budget // 2)
    t2 = time.time() - t0
    print(f"streaming run 2 (half budget): {t2:.0f}s wall")

    ok = all(h1[k] == h2[k] for k in ks)
    print(f"partition self-consistency: {'OK' if ok else 'MISMATCH'}")
    digest = {k: h1[k][: args.members] for k in ks}
    print(json.dumps({"wall_s_run1": round(t1, 1), "wall_s_run2": round(t2, 1),
                      "mem": stats, "hist_head": digest}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
