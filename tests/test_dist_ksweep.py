"""Sharded shared-sort k-sweep (dist/ksweep.py) vs the single-device sweep."""

import numpy as np
import pytest

from conftest import cpu_devices, random_dna
from khoice_tpu.dist import make_mesh
from khoice_tpu.dist.ksweep import sharded_occurrence_histograms_sweep
from khoice_tpu.engine.ksweep import occurrence_histograms_sweep, plan_sweep
from khoice_tpu.io import encode_records


def _members(rng, n=4, glen=1200):
    base = random_dna(rng, glen)
    out = []
    for i in range(n):
        seq = list(base)
        for _ in range(50 * (i + 1)):
            seq[rng.randrange(glen)] = "ACGT"[rng.randrange(4)]
        tail = "A" * 200 if i == 0 else ("N" + random_dna(rng, 80) if i == 1 else "")
        out.append("".join(seq) + tail)
    return [encode_records([m]) for m in out]


def test_sharded_sweep_matches_single_device_across_classes(rng):
    """ks spanning 2-word and 4-word classes (incl. the packed master),
    members share a mutated core, N bases and a poly-A block."""
    mesh = make_mesh(devices=cpu_devices(8))
    codes = _members(rng)
    ks = [7, 12, 21, 31, 33, 45, 49]
    classes, remaining = plan_sweep(ks, len(codes))
    assert remaining == [] and classes[0][3] is True  # packed master plan
    got = sharded_occurrence_histograms_sweep(mesh, codes, ks, cs=5000, cx=24)
    want = occurrence_histograms_sweep(codes, ks, cs=5000, cx=24)
    for k in ks:
        assert got[k] == want[k], f"k={k}"


@pytest.mark.heavy
def test_sharded_sweep_device_count_invariance(rng):
    codes = _members(rng, n=3, glen=900)
    ks = [9, 13, 17, 25]
    want = occurrence_histograms_sweep(codes, ks, cs=5000, cx=8)
    for nd in (1, 2, 8):
        mesh = make_mesh(devices=cpu_devices(nd))
        got = sharded_occurrence_histograms_sweep(mesh, codes, ks, cs=5000, cx=8)
        for k in ks:
            assert got[k] == want[k], f"nd={nd} k={k}"


def test_sharded_sweep_unpacked_class(rng):
    """A k set whose master class has no spare bits (kmax=48 -> KW=3,
    spare=0) exercises the separate-payload exchange."""
    mesh = make_mesh(devices=cpu_devices(8))
    codes = _members(rng, n=3, glen=800)
    ks = [34, 40, 44, 48]
    classes, _ = plan_sweep(ks, len(codes))
    assert classes and classes[0][3] is False
    got = sharded_occurrence_histograms_sweep(mesh, codes, ks, cs=5000, cx=8)
    want = occurrence_histograms_sweep(codes, ks, cs=5000, cx=8)
    for k in ks:
        assert got[k] == want[k], f"k={k}"


def test_sharded_sweep_fallback_per_k(rng):
    """Tiny grids fall back to the per-k sharded fused path but stay exact."""
    mesh = make_mesh(devices=cpu_devices(4))
    codes = _members(rng, n=3, glen=600)
    ks = [11, 15]
    got = sharded_occurrence_histograms_sweep(mesh, codes, ks, cs=5000, cx=8)
    want = occurrence_histograms_sweep(codes, ks, cs=5000, cx=8)
    for k in ks:
        assert got[k] == want[k]


@pytest.mark.heavy
def test_sharded_sweep_overflow_retry(rng):
    """A tiny bucket cap forces the overflow-doubling path; results stay
    bit-exact after the retries."""
    mesh = make_mesh(devices=cpu_devices(8))
    codes = _members(rng, n=3, glen=1000)
    ks = [9, 13, 17]
    got = sharded_occurrence_histograms_sweep(
        mesh, codes, ks, cs=5000, cx=8, bucket_cap=16
    )
    want = occurrence_histograms_sweep(codes, ks, cs=5000, cx=8)
    for k in ks:
        assert got[k] == want[k], f"k={k}"
