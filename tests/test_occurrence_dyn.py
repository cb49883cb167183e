"""Dynamic-k fused path vs static path vs oracle across word widths."""

import pytest

from conftest import random_dna
from khoice_tpu import oracle
from khoice_tpu.engine.occurrence import occurrence_histogram
from khoice_tpu.io import encode_records


@pytest.mark.parametrize("k", [7, 15, 16, 31, 33, 49])
def test_dynamic_k_matches_static_and_oracle(rng, k):
    base = random_dna(rng, 500)
    members = []
    for i in range(3):
        seq = list(base)
        for _ in range(30 * (i + 1)):
            seq[rng.randrange(len(base))] = "ACGT"[rng.randrange(4)]
        members.append("".join(seq))
    codes = [encode_records([m], pad_to=512) for m in members]

    dyn = occurrence_histogram(codes, k, cs=5000, cx=32, dynamic_k=True)
    static = occurrence_histogram(codes, k, cs=5000, cx=32, dynamic_k=False)
    assert dyn == static

    od = oracle.union_sum(
        [oracle.set_counts(oracle.count_kmers([m], k), 1) for m in members], cs=5000
    )
    assert dyn == oracle.histogram(od, cx=32)


def test_dynamic_k_shares_one_compile(rng):
    """All k of one width class hit the same jit cache entry (unpacked
    fallback path; the packed path's sharing is pinned in
    test_occurrence_packed.py)."""
    import jax.numpy as jnp

    from khoice_tpu.engine.bits import key_words
    from khoice_tpu.engine.occurrence import (
        _occurrence_histogram_dyn,
        kmax_class,
        pack_members,
    )

    members = [random_dna(rng, 400) for _ in range(2)]
    codes = [encode_records([m], pad_to=512) for m in members]
    packed = pack_members([__import__("numpy").asarray(c) for c in codes])
    cg = (jnp.asarray(packed[0]), jnp.asarray(packed[1]))
    base_misses = _occurrence_histogram_dyn._cache_size()
    for k in (7, 9, 11, 13, 15):
        km = kmax_class(k)
        _occurrence_histogram_dyn(
            cg, jnp.uint32(k), km, 5000, 16, key_words(km), 2
        )
    assert _occurrence_histogram_dyn._cache_size() == base_misses + 1
