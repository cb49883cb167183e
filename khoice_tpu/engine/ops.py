"""KMC3 / kmc_tools-equivalent operations on KmerTables.

Semantics contract (mirrors what the reference pipeline relies on):

- ``count_codes``: canonical counting with saturating counters, default cap
  255 (KMC's default -cs; the reference passes -ci1 so singletons are kept,
  workflow/rules/exp_type_1.smk:163).
- ``set_counts``: `kmc_tools transform ... set_counts c`
  (exp_type_1.smk:173).
- ``union_many``: n-way `kmc_tools complex` union with counter *sum*,
  saturating at cs (the reference always passes -cs5000,
  exp_type_1.smk:61,84).
- ``intersect_sum``: `kmc_tools simple A B intersect -ocsum`
  (exp_type_2.smk:362-366): keys in both, count = cA+cB.
- ``subtract``: `kmc_tools simple A B kmers_subtract` (exp_type_2.smk:368-380):
  keys of A absent from B, counts from A.
- ``histogram``: `kmc_tools transform ... histogram` (exp_type_1.smk:191):
  hist[i] = number of distinct present keys with count == i, i in 1..cx.

Everything is static-shape: absent keys are encoded as count==0 and unused
capacity as SENTINEL keys, so tables compose under jit/vmap/shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .bits import (
    SENTINEL,
    key_words,
    searchsorted_words,
    take_words,
    words_eq,
    words_is_sentinel,
)
from .extract import extract_canonical
from .table import KmerTable

__all__ = [
    "count_codes",
    "dedupe_sorted",
    "union_many",
    "intersect_sum",
    "subtract",
    "set_counts",
    "histogram",
    "n_present",
    "total_count",
    "count_keys",
]


def _sort_keys_counts(keys: tuple, counts: jnp.ndarray):
    w = len(keys)
    sorted_ops = jax.lax.sort(list(keys) + [counts], num_keys=w)
    return tuple(sorted_ops[:w]), sorted_ops[w]


def dedupe_sorted(keys: tuple, counts: jnp.ndarray, cs: int) -> tuple:
    """Collapse equal adjacent keys of a sorted run, summing counts (sat. cs).

    Returns (unique_keys, unique_counts) of the same capacity with the
    KmerTable invariant (ascending keys, SENTINEL tail, count 0 = absent).
    """
    c = counts.shape[0]
    w = len(keys)
    prev = take_words(keys, jnp.maximum(jnp.arange(c) - 1, 0))
    is_new = ~words_eq(keys, prev)
    is_new = is_new.at[0].set(True)
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    ucounts = jnp.zeros((c,), jnp.uint32).at[seg].add(counts)
    ukeys = tuple(
        jnp.full((c,), SENTINEL, jnp.uint32).at[seg].set(kw) for kw in keys
    )
    # drop the sentinel-padding segment and saturate
    sent = words_is_sentinel(ukeys)
    ucounts = jnp.where(sent, 0, jnp.minimum(ucounts, jnp.uint32(cs)))
    return ukeys, ucounts


def count_keys(keys: tuple, valid: jnp.ndarray, k: int, cs: int = 255) -> KmerTable:
    """Build a count table from pre-extracted canonical keys."""
    ones = valid.astype(jnp.uint32)
    skeys, scounts = _sort_keys_counts(keys, ones)
    ukeys, ucounts = dedupe_sorted(skeys, scounts, cs)
    return KmerTable(keys=ukeys, counts=ucounts, k=k)


def count_codes(codes: jnp.ndarray, k: int, cs: int = 255) -> KmerTable:
    """Canonical k-mer counting over encoded codes (KMC `kmc -ci1` role)."""
    keys, valid = extract_canonical(codes, k)
    return count_keys(keys, valid, k, cs)


def set_counts(t: KmerTable, c: int) -> KmerTable:
    counts = jnp.where(t.counts > 0, jnp.uint32(c), jnp.uint32(0))
    return KmerTable(keys=t.keys, counts=counts, k=t.k)


def union_many(tables: list, cs: int = 5000, capacity: int | None = None) -> KmerTable:
    """n-way union with counter sum (kmc_tools complex '+', -cs{cs})."""
    k = tables[0].k
    w = tables[0].n_words
    for t in tables:
        assert t.k == k and t.n_words == w
    keys = tuple(
        jnp.concatenate([t.keys[i] for t in tables]) for i in range(w)
    )
    counts = jnp.concatenate([t.counts for t in tables])
    skeys, scounts = _sort_keys_counts(keys, counts)
    ukeys, ucounts = dedupe_sorted(skeys, scounts, cs)
    out = KmerTable(keys=ukeys, counts=ucounts, k=k)
    return out


def _lookup_counts(t: KmerTable, query_keys: tuple) -> jnp.ndarray:
    """For each query key: t's count if present, else 0."""
    idx = searchsorted_words(t.keys, query_keys)
    found_keys = take_words(t.keys, idx)
    found = words_eq(found_keys, query_keys) & (idx < t.capacity)
    cnt = jnp.take(t.counts, idx, mode="clip")
    return jnp.where(found, cnt, jnp.uint32(0))


def intersect_sum(a: KmerTable, b: KmerTable, cs: int = 255) -> KmerTable:
    """`kmc_tools simple a b intersect -ocsum` (keys in both, counts summed)."""
    bc = _lookup_counts(b, a.keys)
    both = (a.counts > 0) & (bc > 0)
    counts = jnp.where(both, jnp.minimum(a.counts + bc, jnp.uint32(cs)), 0)
    return KmerTable(keys=a.keys, counts=counts.astype(jnp.uint32), k=a.k)


def subtract(a: KmerTable, b: KmerTable) -> KmerTable:
    """`kmc_tools simple a b kmers_subtract` (keys of a not in b)."""
    bc = _lookup_counts(b, a.keys)
    counts = jnp.where((a.counts > 0) & (bc == 0), a.counts, jnp.uint32(0))
    return KmerTable(keys=a.keys, counts=counts, k=a.k)


def histogram(t: KmerTable, cx: int = 10000) -> jnp.ndarray:
    """Occurrence histogram: out[i-1] = #present keys with count i, i=1..cx.

    Computed by sorting the (small-dtype, single-word) counts and binary
    searching the cx bin edges — no scatter, TPU-friendly.
    """
    counts = jnp.minimum(t.counts, jnp.uint32(cx + 1))
    sorted_counts = jax.lax.sort(counts)
    edges = jnp.arange(1, cx + 2, dtype=jnp.uint32)
    pos = jnp.searchsorted(sorted_counts, edges, side="left")
    return (pos[1:] - pos[:-1]).astype(jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)


def n_present(t: KmerTable) -> jnp.ndarray:
    return jnp.sum((t.counts > 0).astype(jnp.int32))


def total_count(t: KmerTable) -> jnp.ndarray:
    return jnp.sum(t.counts.astype(jnp.int32))
