"""Read simulators + subsetting modes (exp0 toolchain)."""

import numpy as np
import pytest

from conftest import random_dna
from khoice_tpu.mems.extract import Feature
from khoice_tpu.sim import (
    grab_reads,
    sim_illumina,
    sim_ont,
    subset_features_half_mems,
    subset_features_mems,
    subset_reads_kmers,
)


def test_sim_illumina_deterministic(rng):
    seqs = [random_dna(rng, 5000)]
    r1 = sim_illumina(seqs, np.random.default_rng(7))
    r2 = sim_illumina(seqs, np.random.default_rng(7))
    assert r1 == r2
    assert all(len(r) == 150 for r in r1)
    # 10x coverage
    assert len(r1) == int(np.ceil(10.0 * 5000 / 150))


def test_sim_ont_length_range(rng):
    seqs = [random_dna(rng, 20000)]
    reads = sim_ont(seqs, np.random.default_rng(7))
    assert reads
    # indels shift lengths slightly around [900, 1100]
    assert all(700 < len(r) < 1300 for r in reads)


def test_grab_reads(rng):
    seqs = [random_dna(rng, 2000), random_dna(rng, 2000)]
    reads = grab_reads(seqs, np.random.default_rng(3), num_reads=50, read_length=80)
    assert len(reads) == 50
    assert all(len(r) == 80 for r in reads)


def test_subset_kmers_budget(rng):
    reads = [random_dna(rng, 100) for _ in range(100)]
    out = subset_reads_kmers(reads, np.random.default_rng(1), 500, 31)
    total = sum(len(r) - 30 for r in out)
    assert total >= 500
    # minimal: removing the last read must drop below budget
    assert total - (len(out[-1]) - 30) < 500
    with pytest.raises(ValueError):
        subset_reads_kmers(reads[:2], np.random.default_rng(1), 10**6, 31)


def _features(n):
    return [
        Feature(name=f"read_{i}_mem_{i}_length_50", seq="A" * 50, length=50, read_num=i, kind="mem")
        for i in range(n)
    ]


def test_subset_half_mems():
    feats = _features(50)
    out = subset_features_half_mems(feats, np.random.default_rng(0), 20)
    assert len(out) == 50  # under the +10000 buffer, all kept
    assert len({f.name for f in out}) == 50


def test_subset_mems_budget():
    feats = _features(100000)
    out = subset_features_mems(feats, np.random.default_rng(0), 1000, total_ref_length=4**10)
    per = 50 - 10  # len - log4(4^10)
    assert len(out) == int(np.ceil((1000 + 10000) / per))
