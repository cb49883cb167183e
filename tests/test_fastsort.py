"""engine/fastsort.py: exactness vs lax.sort, incl. the guard fallback.

fast_sort's fast path needs m % 4096 == 0 and m >= 16384; these tests run
at m = 16384/32768 so the partition + window passes + guard actually
execute (smaller inputs take the flat-sort branch trivially).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from khoice_tpu.engine.fastsort import WINDOW, fast_sort


pytestmark = pytest.mark.heavy  # retired sort scaffold (BASELINE.md post-mortem)

def _ref_sort(ops, nk):
    return tuple(np.asarray(w) for w in jax.lax.sort(list(ops), num_keys=nk, is_stable=False))


def _check(ops, nk):
    got = tuple(np.asarray(w) for w in fast_sort(tuple(ops), nk))
    want = _ref_sort(ops, nk)
    for i in range(nk):
        np.testing.assert_array_equal(got[i], want[i], err_msg=f"key word {i}")
    # payload operands: equal multisets of full tuples (order within
    # equal keys is arbitrary for both sorts)
    if len(ops) > nk:
        gt = np.stack(got)
        wt = np.stack(want)
        np.testing.assert_array_equal(
            gt[:, np.lexsort(gt[::-1])], wt[:, np.lexsort(wt[::-1])]
        )


def test_fast_sort_random_uniform():
    rng = np.random.default_rng(0)
    m = 4 * WINDOW
    ops = [jnp.asarray(rng.integers(0, 2**32, m, dtype=np.uint32)) for _ in range(4)]
    _check(ops, 4)


def test_fast_sort_with_payload_operand():
    rng = np.random.default_rng(1)
    m = 4 * WINDOW
    ops = [jnp.asarray(rng.integers(0, 2**32, m, dtype=np.uint32)) for _ in range(2)]
    ops.append(jnp.arange(m, dtype=jnp.uint32))  # payload
    _check(ops, 2)


def test_fast_sort_long_tie_runs_force_guard():
    """w0 tie runs far longer than a window (low-complexity text shape):
    the sorted-guard must fire and the result must still be exact."""
    rng = np.random.default_rng(2)
    m = 8 * WINDOW
    w0 = np.zeros(m, np.uint32)
    w0[: m // 2] = 7  # two giant ties
    perm = rng.permutation(m)
    ops = [
        jnp.asarray(w0[perm]),
        jnp.asarray(rng.integers(0, 2**32, m, dtype=np.uint32)),
        jnp.asarray(rng.integers(0, 2**32, m, dtype=np.uint32)),
    ]
    _check(ops, 3)


def test_fast_sort_sentinel_block():
    """A large identical sentinel block (all-ones keys) plus rare real
    all-ones-w0 elements — the clamped partition keeps them separated."""
    rng = np.random.default_rng(3)
    m = 4 * WINDOW
    n_sent = m // 3
    w0 = rng.integers(0, 2**32, m, dtype=np.uint32)
    w1 = rng.integers(0, 2**32, m, dtype=np.uint32)
    sent = rng.permutation(m)[:n_sent]
    w0[sent] = 0xFFFFFFFF
    w1[sent] = 0xFFFFFFFF
    # a few REAL elements sharing w0 = all-ones but smaller w1
    reals = np.setdiff1d(np.arange(m), sent)[:5]
    w0[reals] = 0xFFFFFFFF
    w1[reals] = 123
    is_sent = np.zeros(m, bool)
    is_sent[sent] = True
    ops = (jnp.asarray(w0), jnp.asarray(w1))
    got = tuple(np.asarray(w) for w in fast_sort(ops, 2, is_sentinel=jnp.asarray(is_sent)))
    want = _ref_sort(ops, 2)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_sweep_histograms_unchanged_polyA(rng):
    """End-to-end: the sweep with fast_sort stays bit-identical to the
    per-k fused path on poly-A/poly-T-heavy text (guard-fallback data)."""
    from conftest import random_dna
    from khoice_tpu.engine.ksweep import occurrence_histograms_sweep
    from khoice_tpu.engine.occurrence import occurrence_histogram
    from khoice_tpu.io.packing import encode_seq

    seqs = [
        "A" * 3000 + random_dna(rng, 2000) + "T" * 3000,
        "T" * 2500 + random_dna(rng, 3000) + "A" * 1000 + "N" * 50,
        random_dna(rng, 6000),
    ]
    members = [encode_seq(s) for s in seqs]
    ks = [7, 11, 16, 22, 31, 34]
    swept = occurrence_histograms_sweep(members, ks, cx=8)
    for k in ks:
        assert swept[k] == occurrence_histogram(members, k, cx=8), f"k={k}"
