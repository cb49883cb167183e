"""Engine vs oracle: canonical counting and set algebra, k across word widths."""

import numpy as np
import pytest

from conftest import random_dna
from khoice_tpu.engine import (
    count_codes,
    histogram,
    intersect_sum,
    n_present,
    set_counts,
    subtract,
    union_many,
)
from khoice_tpu.engine.extract import extract_canonical_sweep
from khoice_tpu.engine.ops import count_keys
from khoice_tpu.engine.table import encode_kmer, decode_key
from khoice_tpu.io import encode_records
from khoice_tpu import oracle

import jax.numpy as jnp

KS = [3, 15, 16, 31, 32, 49]


def table_as_dict(t):
    return {km: c for km, c in t.dump()}


@pytest.mark.parametrize("k", KS)
def test_count_matches_oracle(rng, k):
    seqs = [random_dna(rng, 300, n_prob=0.02) for _ in range(3)]
    codes = jnp.asarray(encode_records(seqs))
    t = count_codes(codes, k)
    expected = oracle.count_kmers(seqs, k)
    assert table_as_dict(t) == expected


def test_counter_saturation(rng):
    seq = "ACGTACGTAC" * 100
    t = count_codes(jnp.asarray(encode_records([seq])), 4, cs=255)
    d = table_as_dict(t)
    expected = oracle.count_kmers([seq], 4, cs=255)
    assert d == expected
    assert max(d.values()) == 255


def test_dump_is_sorted(rng):
    seqs = [random_dna(rng, 500)]
    t = count_codes(jnp.asarray(encode_records(seqs)), 11)
    kmers = [km for km, _ in t.dump()]
    assert kmers == sorted(kmers)
    assert len(set(kmers)) == len(kmers)


@pytest.mark.parametrize("k", [9, 21, 33])
def test_set_algebra_matches_oracle(rng, k):
    g1 = [random_dna(rng, 400) for _ in range(2)]
    g2 = [random_dna(rng, 400) for _ in range(2)]
    # share some sequence so intersections are non-trivial
    shared = random_dna(rng, 200)
    g1[0] += shared
    g2[0] += shared

    c1 = [count_codes(jnp.asarray(encode_records([s])), k) for s in g1]
    c2 = [count_codes(jnp.asarray(encode_records([s])), k) for s in g2]
    o1 = [oracle.count_kmers([s], k) for s in g1]
    o2 = [oracle.count_kmers([s], k) for s in g2]

    s1 = [set_counts(t, 1) for t in c1]
    s2 = [set_counts(t, 1) for t in c2]
    os1 = [oracle.set_counts(d, 1) for d in o1]
    os2 = [oracle.set_counts(d, 1) for d in o2]

    u1 = union_many(s1, cs=5000)
    u2 = union_many(s2, cs=5000)
    ou1 = oracle.union_sum(os1, cs=5000)
    ou2 = oracle.union_sum(os2, cs=5000)
    assert table_as_dict(u1) == ou1
    assert table_as_dict(u2) == ou2

    inter = intersect_sum(u1, u2)
    ointer = oracle.intersect_sum(ou1, ou2)
    assert table_as_dict(inter) == ointer

    sub = subtract(u1, u2)
    osub = oracle.subtract(ou1, ou2)
    assert table_as_dict(sub) == osub


def test_union_saturation(rng):
    seq = random_dna(rng, 100)
    tables = [set_counts(count_codes(jnp.asarray(encode_records([seq])), 7), 1) for _ in range(5)]
    u = union_many(tables, cs=3)
    d = table_as_dict(u)
    assert set(d.values()) == {3}


@pytest.mark.parametrize("k", [5, 17])
def test_histogram_matches_oracle(rng, k):
    seqs = [random_dna(rng, 600) for _ in range(3)]
    sets = [set_counts(count_codes(jnp.asarray(encode_records([s])), k), 1) for s in seqs]
    u = union_many(sets, cs=5000)
    hist = np.asarray(histogram(u, cx=50))
    od = oracle.union_sum([oracle.set_counts(oracle.count_kmers([s], k), 1) for s in seqs], cs=5000)
    ohist = oracle.histogram(od, cx=50)
    assert hist.tolist() == ohist


def test_sweep_matches_single_extraction(rng):
    seqs = [random_dna(rng, 400, n_prob=0.01)]
    codes = jnp.asarray(encode_records(seqs))
    ks = (7, 15, 16, 21, 31, 32, 40)
    sweep = extract_canonical_sweep(codes, ks)
    for k in ks:
        keys, valid = sweep[k]
        t = count_keys(keys, valid, k)
        expected = oracle.count_kmers(seqs, k)
        assert table_as_dict(t) == expected, f"k={k}"


def test_encode_decode_roundtrip(rng):
    for k in [1, 15, 16, 31, 32, 49, 63]:
        km = random_dna(rng, k)
        assert decode_key(encode_kmer(km), k) == km


def test_empty_and_all_n():
    codes = jnp.asarray(encode_records(["NNNNNNNNNN"]))
    t = count_codes(codes, 5)
    assert t.dump() == []
    assert int(n_present(t)) == 0
