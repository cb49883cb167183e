#!/usr/bin/env python3
"""Hardware bit-exactness gate: master-class sweep vs per-k fused path.

Runs the full reference 30-point k grid over adversarial data (shared
mutated cores, N runs, poly-A blocks, record separators) on the REAL
device and asserts every k's occurrence histogram from the shared-sort
sweep (engine/ksweep.py + the Pallas multi-k kernel) is bit-identical to
the independent per-k fused path (engine/occurrence.py). The CPU test
suite covers the same property in interpret mode; this script is the
on-hardware counterpart (Mosaic-compiled kernel, real sort).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from khoice_tpu.cli import _enable_persistent_compile_cache

_enable_persistent_compile_cache()


def main() -> int:
    import jax
    import jax.numpy as jnp

    from khoice_tpu.engine.ksweep import (
        _sweep_pallas_ok,
        occurrence_histograms_sweep_packed,
    )
    from khoice_tpu.engine.occurrence import (
        occurrence_histogram_packed,
        pack_members,
    )

    backend = jax.default_backend()
    if backend == "cpu":
        print("FAIL: running on the CPU backend — the Pallas kernel and "
              "device sort this gate exists to exercise are not in play "
              "(the CPU suite already covers interpret mode)")
        return 2

    n_genomes = 8
    rng = np.random.default_rng(3)
    core = rng.integers(0, 4, size=200_000, dtype=np.uint8)
    members = []
    for m in range(n_genomes):
        g = core.copy()
        idx = rng.integers(0, g.shape[0], size=3000 * (m + 1))
        g[idx] = rng.integers(0, 4, size=idx.shape[0])
        g[1000:1400] = 4  # N run
        tail = rng.integers(0, 4, size=50_000, dtype=np.uint8)
        members.append(np.concatenate([g, np.zeros(5000, np.uint8), tail]))
    codes, gids = pack_members(members)
    packed = (jnp.asarray(codes), jnp.asarray(gids))
    k_grid = list(range(7, 31)) + [34, 37, 40, 43, 46, 49]

    if not _sweep_pallas_ok(2 * int(codes.shape[0]), n_genomes):
        print("FAIL: the sweep would take the XLA fallback, not the Pallas "
              "kernel — the gate would compare the same code against itself")
        return 2

    sweep = occurrence_histograms_sweep_packed(packed, n_genomes, k_grid,
                                               cs=5000, cx=16)
    bad = 0
    for k in k_grid:
        want = occurrence_histogram_packed(packed, n_genomes, k, cs=5000, cx=16)
        if sweep[k] != want:
            bad += 1
            print(f"MISMATCH k={k}: {sweep[k][:10]} vs {want[:10]}")
    print("OK all 30 ks bit-identical" if bad == 0 else f"{bad} mismatches")

    bad += _check_classify_modes(rng)
    return 1 if bad else 0


def _check_classify_modes(rng) -> int:
    """Mosaic-compiled classification scan modes vs the XLA scans on the
    REAL device (the CPU suite pins interpret mode only).  Small ks-span
    grid across word classes; member 0 doubles as pivot/query."""
    import jax.numpy as jnp

    from khoice_tpu.engine.ksweep import plan_sweep
    from khoice_tpu.engine.ksweep_classify import (
        _sorted_doubled_fn,
        _sweep_class_containment,
        _sweep_class_feature_buckets,
        _sweep_class_multi_pivot,
        _sweep_class_pivot_rest,
    )
    from khoice_tpu.engine.occurrence import pack_members

    members = []
    core = rng.integers(0, 4, size=60_000, dtype=np.uint8)
    for m in range(4):
        g = core.copy()
        idx = rng.integers(0, g.shape[0], size=800 * (m + 1))
        g[idx] = rng.integers(0, 4, size=idx.shape[0])
        members.append(np.concatenate(
            [g, rng.integers(0, 4, size=20_000, dtype=np.uint8)]
        ))
    ks = (8, 11, 16, 22, 31, 34, 49)
    classes, rem = plan_sweep(ks, len(members))
    assert not rem
    codes, gids = pack_members(members)
    kmax, KW, cks, packed = classes[0]
    skeys, spay = _sorted_doubled_fn(
        jnp.asarray(codes), jnp.asarray(gids), kmax, KW, packed
    )
    bad = 0
    cases = [
        ("pivot_rest", lambda up: _sweep_class_pivot_rest(
            skeys, spay, cks, kmax, KW, 3, 5000, packed, up)),
        ("multi_pivot", lambda up: _sweep_class_multi_pivot(
            skeys, spay, cks, kmax, KW, 2, 5000, packed, up)),
        ("containment", lambda up: _sweep_class_containment(
            skeys, spay, cks, kmax, KW, 2, 2, 5000, packed, up)),
        ("buckets", lambda up: _sweep_class_feature_buckets(
            skeys, spay, cks, kmax, KW, 3, 5000, 7, packed, up)),
    ]
    for name, fn in cases:
        got = fn(True)
        want = fn(False)
        if isinstance(got, tuple):
            ok = all(
                np.array_equal(np.asarray(g), np.asarray(w))
                for g, w in zip(got, want)
            )
        else:
            ok = np.array_equal(np.asarray(got), np.asarray(want))
        if not ok:
            bad += 1
            print(f"MISMATCH classify mode {name} (Pallas vs XLA on device)")
    print("OK classify modes device-identical" if bad == 0
          else f"{bad} classify-mode mismatches")
    return bad


if __name__ == "__main__":
    sys.exit(main())
