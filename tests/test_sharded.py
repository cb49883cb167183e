"""Sharded engine on an 8-virtual-CPU-device mesh vs single-device engine."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import cpu_devices, random_dna
from khoice_tpu import oracle
from khoice_tpu.dist import (
    make_mesh,
    sharded_count_codes,
    sharded_histogram,
    sharded_intersect_sum,
    sharded_set_counts,
    sharded_subtract,
    sharded_union_many,
)
from khoice_tpu.engine import count_codes, histogram, set_counts, union_many
from khoice_tpu.io import encode_records


def mesh8():
    return make_mesh(devices=cpu_devices(8))


@pytest.fixture(autouse=True)
def fresh_splits():
    """Each test pins its own session split points (first table wins)."""
    from khoice_tpu.dist.sharded import reset_session_splits

    reset_session_splits()
    yield
    reset_session_splits()


def as_dict(t):
    return {km: c for km, c in t.dump()}


@pytest.mark.parametrize("k", [11, 21, 33])
def test_sharded_count_matches_oracle(rng, k):
    mesh = mesh8()
    seqs = [random_dna(rng, 700, n_prob=0.01) for _ in range(2)]
    codes = encode_records(seqs)
    st = sharded_count_codes(mesh, codes, k)
    assert as_dict(st) == oracle.count_kmers(seqs, k)


def test_sharded_dump_globally_sorted(rng):
    mesh = mesh8()
    codes = encode_records([random_dna(rng, 1000)])
    st = sharded_count_codes(mesh, codes, 13)
    kmers = [km for km, _ in st.dump()]
    assert kmers == sorted(kmers)


def test_sharded_algebra_matches_single_device(rng):
    mesh = mesh8()
    k = 17
    shared = random_dna(rng, 300)
    seqs_a = [random_dna(rng, 500) + shared for _ in range(3)]
    seqs_b = [shared + random_dna(rng, 400) for _ in range(2)]

    sa = [sharded_set_counts(sharded_count_codes(mesh, encode_records([s]), k), 1) for s in seqs_a]
    sb = [sharded_set_counts(sharded_count_codes(mesh, encode_records([s]), k), 1) for s in seqs_b]
    ua = sharded_union_many(sa, cs=5000)
    ub = sharded_union_many(sb, cs=5000)

    oa = oracle.union_sum([oracle.set_counts(oracle.count_kmers([s], k), 1) for s in seqs_a], cs=5000)
    ob = oracle.union_sum([oracle.set_counts(oracle.count_kmers([s], k), 1) for s in seqs_b], cs=5000)
    assert as_dict(ua) == oa
    assert as_dict(ub) == ob

    inter = sharded_intersect_sum(ua, ub)
    assert as_dict(inter) == oracle.intersect_sum(oa, ob)

    sub = sharded_subtract(ua, ub)
    assert as_dict(sub) == oracle.subtract(oa, ob)

    hist = sharded_histogram(ua, cx=40).tolist()
    assert hist == oracle.histogram(oa, cx=40)


def test_sharded_overflow_retry(rng):
    # Tiny bucket cap forces the overflow-doubling path.
    mesh = mesh8()
    seqs = [random_dna(rng, 2000)]
    st = sharded_count_codes(mesh, encode_records(seqs), 9, bucket_cap=8)
    assert as_dict(st) == oracle.count_kmers(seqs, 9)


def test_device_count_invariance(rng):
    seqs = [random_dna(rng, 600, n_prob=0.02)]
    codes = encode_records(seqs)
    d1 = as_dict(count_codes(jnp.asarray(codes), 15))
    for nd in (2, 8):
        mesh = make_mesh(devices=cpu_devices(nd))
        assert as_dict(sharded_count_codes(mesh, codes, 15)) == d1


@pytest.mark.heavy
def test_sharded_union_disjoint_distributions(rng):
    """Tables built from very different key distributions (GC-rich vs
    AT-rich vs shared core) must still union correctly — the round-2
    regression sharded each table by ITS OWN sampled splits, so shared
    keys never co-located and union counts came out 1 instead of 3."""
    mesh = mesh8()
    k = 13
    core = random_dna(rng, 250)
    gc = "".join(rng.choice(list("GC")) for _ in range(800)) + core
    at = "".join(rng.choice(list("AT")) for _ in range(800)) + core
    mixed = core + random_dna(rng, 600)
    seqs = [gc, at, mixed]

    ts = [
        sharded_set_counts(sharded_count_codes(mesh, encode_records([s]), k), 1)
        for s in seqs
    ]
    # all in-session tables must share the pinned partition
    assert all(np.array_equal(ts[0].splits, t.splits) for t in ts[1:])
    u = sharded_union_many(ts, cs=5000)
    expect = oracle.union_sum(
        [oracle.set_counts(oracle.count_kmers([s], k), 1) for s in seqs], cs=5000
    )
    assert as_dict(u) == expect
    # core k-mers appear in all three tables
    assert max(expect.values()) == 3 and max(as_dict(u).values()) == 3


def test_resplit_foreign_partition(rng):
    """A table re-partitioned onto foreign splits (session-boundary case)
    still dumps identically and combines correctly."""
    from khoice_tpu.dist.sharded import reset_session_splits, resplit

    mesh = mesh8()
    k = 11
    a_seq = random_dna(rng, 900)
    b_seq = a_seq[:400] + random_dna(rng, 500)
    ta = sharded_count_codes(mesh, encode_records([a_seq]), k)
    reset_session_splits()  # simulate a different session for table b
    tb = sharded_count_codes(mesh, encode_records([b_seq]), k)
    assert not np.array_equal(ta.splits, tb.splits)

    tb2 = resplit(tb, ta.splits)
    assert as_dict(tb2) == as_dict(tb)

    inter = sharded_intersect_sum(ta, tb)  # auto-resplits b
    assert as_dict(inter) == oracle.intersect_sum(
        oracle.count_kmers([a_seq], k), oracle.count_kmers([b_seq], k)
    )


def test_sharded_count_skewed_no_retry(rng):
    """The generic sharded count must balance shards on adversarially
    skewed keys (~90% poly-A prefix) via sampled splits — the uniform-CDF
    table would funnel nearly everything into shard 0 and trip the
    overflow retry."""
    from khoice_tpu.dist import sharded as sh

    skew = "A" * 4000 + random_dna(rng, 500)
    codes = encode_records([skew])
    calls = []
    orig = sh._count_fn

    def counting(*a, **kw):
        calls.append(a)
        return orig(*a, **kw)

    sh._count_fn = counting
    try:
        t = sh.sharded_count_codes(make_mesh(8, cpu_devices(8)), codes, 13)
    finally:
        sh._count_fn = orig
    assert len(calls) == 1, "overflow retry triggered on skewed input"
    # exactness unchanged
    expect = oracle.count_kmers([skew], 13)
    got = dict(t.dump())
    assert got == {k: min(v, 255) for k, v in expect.items()}
