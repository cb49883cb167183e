"""Pallas merge-path sort vs lax.sort (interpret mode on CPU).

Covers multi-word keys, payload operands, massive tie runs (the
adversarial case for partition-style sorts — merge-path must handle them
exactly by construction), sentinel blocks, and non-power-of-two run
counts (pass-through runs and the unequal final pair)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from khoice_tpu.kernels.merge_pallas import T_TILE, merge_sort

from khoice_tpu.engine.occurrence import compute_on_tpu

pytestmark = [
    pytest.mark.skipif(compute_on_tpu(), reason="interpret-mode suite"),
    pytest.mark.heavy,  # retired sort scaffold (BASELINE.md post-mortem)
]


def _check(ops, nk, row_len):
    got = tuple(
        np.asarray(w)
        for w in merge_sort(tuple(ops), nk, row_len=row_len, interpret=True)
    )
    want = tuple(
        np.asarray(w)
        for w in jax.lax.sort(list(ops), num_keys=nk, is_stable=False)
    )
    for i in range(nk):
        np.testing.assert_array_equal(got[i], want[i], err_msg=f"key word {i}")
    if len(ops) > nk:
        gt, wt = np.stack(got), np.stack(want)
        np.testing.assert_array_equal(
            gt[:, np.lexsort(gt[::-1])], wt[:, np.lexsort(wt[::-1])]
        )


def test_merge_sort_random_2runs():
    rng = np.random.default_rng(0)
    n = 2 * T_TILE
    ops = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32)) for _ in range(2)]
    _check(ops, 2, T_TILE)


def test_merge_sort_odd_runs_and_payload():
    rng = np.random.default_rng(1)
    n = 3 * T_TILE  # 3 runs: one pass-through level + unequal final pair
    ops = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32)) for _ in range(2)]
    ops.append(jnp.arange(n, dtype=jnp.uint32))  # payload
    _check(ops, 2, T_TILE)


def test_merge_sort_4words_5runs():
    rng = np.random.default_rng(2)
    n = 5 * T_TILE
    ops = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32)) for _ in range(4)]
    _check(ops, 4, T_TILE)


def test_merge_sort_massive_ties():
    rng = np.random.default_rng(3)
    n = 4 * T_TILE
    w0 = np.zeros(n, np.uint32)
    w0[: n // 2] = 5  # two giant tie groups in the first key word
    perm = rng.permutation(n)
    ops = [
        jnp.asarray(w0[perm]),
        jnp.asarray(rng.integers(0, 8, n, dtype=np.uint32)),  # heavy ties in w1 too
    ]
    _check(ops, 2, T_TILE)


def test_merge_sort_sentinel_block():
    rng = np.random.default_rng(4)
    n = 4 * T_TILE
    w0 = rng.integers(0, 2**32, n, dtype=np.uint32)
    w1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    sent = rng.permutation(n)[: n // 3]
    w0[sent] = 0xFFFFFFFF
    w1[sent] = 0xFFFFFFFF
    _check([jnp.asarray(w0), jnp.asarray(w1)], 2, T_TILE)


def test_merge_sort_identical_everything():
    n = 2 * T_TILE
    ops = [jnp.full((n,), 7, jnp.uint32), jnp.arange(n, dtype=jnp.uint32)]
    _check(ops, 1, T_TILE)
