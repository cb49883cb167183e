"""Exact multi-word device sorts around VMEM-resident row sorts.

Honest microbenchmarks at the master-class shape (35.6M x 4 uint32
operands, tools/microbench_fastsort.py — every output consumed so XLA
cannot dead-code-eliminate co-sorted operands) give:

    flat lax.sort num_keys=4          229 ms
    flat lax.sort num_keys=1, 4 ops   204 ms   (movement, not the
                                                comparator, dominates)
    row sort [544, 65536] num_keys=4   64 ms   (rows sort inside VMEM)
    random gather / scatter           ~9 ns/element (rules out radix)

So a partition-pass scheme cannot beat the flat sort (the partition IS
a flat sort), but VMEM row sorts are ~3.6x faster than the flat sort —
the winning full-sort shape is LOCAL ROW SORTS + a Pallas merge-path
kernel (one HBM pass per binary merge level), which this module hosts:

- fast_sort: partition + overlapping-window fix + exact guard.  Kept
  for the STREAMING path's chunk sorts and as scaffolding; on the
  master shape it measures ~271 ms (slower than flat) and is therefore
  NOT used by engine/ksweep._sweep_doubled.
- merge_sort (kernels/merge_pallas.py consumer): row-sorted runs merged
  pairwise, one bandwidth-bound pass per level — the master-sort
  replacement.

Sentinel handling: invalid elements (nio == 0: N positions, record
separators, tail padding) can be re-encoded to an all-ones key with
ZERO payload bits (sentinel_encode_*): scan-inert either way (the
occurrence scans mask on nio), but the re-encode makes them one
identical block that sorts strictly AFTER every real element — real
elements' packed payload bits are nonzero (nio >= 1) while their
spare-above-payload bits are zero, so the sentinel dominates even an
all-T kmax-mer.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

WINDOW = 4096  # one VMEM row per window in the local-fix row sorts


def _lex_gt(a: tuple, b: tuple):
    """a > b lexicographically over uint32 word tuples (first nk words)."""
    gt = jnp.zeros_like(a[0], dtype=jnp.bool_)
    eq = jnp.ones_like(a[0], dtype=jnp.bool_)
    for x, y in zip(a, b):
        gt = gt | (eq & (x > y))
        eq = eq & (x == y)
    return gt


def _window_pass(ops: tuple, nk: int, off: int, W: int) -> tuple:
    """Row-sort overlapping windows of W elements by the full key."""
    m = ops[0].shape[0]
    if off == 0:
        rows = [w.reshape(-1, W) for w in ops]
        s = jax.lax.sort(rows, dimension=1, num_keys=nk, is_stable=False)
        return tuple(w.reshape(-1) for w in s)
    mid = m - W
    mids = [w[off : off + mid].reshape(-1, W) for w in ops]
    s = jax.lax.sort(mids, dimension=1, num_keys=nk, is_stable=False)
    return tuple(
        jnp.concatenate([w[:off], x.reshape(-1), w[off + mid :]])
        for w, x in zip(ops, s)
    )


def fast_sort(elems: tuple, nk: int, is_sentinel=None, W: int = WINDOW) -> tuple:
    """Exact sort of uint32 word operands by the first nk words.

    elems may carry extra payload operands past nk (moved, not compared —
    their order within equal keys is arbitrary, like lax.sort's).
    is_sentinel is accepted for API stability but unused: the sentinel
    block (word 0 all-ones) can tie with real all-T-16-prefix elements in
    the partition pass, but such elements are ~2^-32 per element
    (expected 0.008 at 35.6M on uniform 2-bit text) — when a poly-T
    genome does produce them interleaved beyond window reach, the guard
    detects it and the flat resort keeps the result exact."""
    del is_sentinel
    m = int(elems[0].shape[0])
    if m % W != 0 or m < 4 * W:
        return tuple(jax.lax.sort(list(elems), num_keys=nk, is_stable=False))

    # partition by word 0 only: the comparator width, not the operand
    # count, dominates lax.sort cost (microbench_sort2: nk1 62 ms vs
    # nk4 230 ms at this shape)
    s = tuple(jax.lax.sort(list(elems), num_keys=1, is_stable=False))

    s = _window_pass(s, nk, 0, W)
    s = _window_pass(s, nk, W // 2, W)

    # slice-based adjacent check (no roll: one fused elementwise pass)
    a = tuple(w[:-1] for w in s[:nk])
    b = tuple(w[1:] for w in s[:nk])
    bad = jnp.any(_lex_gt(a, b))

    def resort(t):
        return tuple(jax.lax.sort(list(t), num_keys=nk, is_stable=False))

    return jax.lax.cond(bad, resort, lambda t: t, s)


def sentinel_encode_packed(fwd: tuple, KW: int, nio_bits: int, gid_bits: int):
    """Re-encode invalid packed elements (nio == 0) to the dominant
    sentinel: all-ones key words, ZERO payload bits in the last word.

    The sentinel sorts strictly after EVERY real element: the last word's
    spare-above-payload bits (>= 2 of them, since packing requires
    spare >= PACK_MIN_SPARE = 14 > the 12 payload bits) are ones in the
    sentinel but zero in every real element.  The occurrence scans are
    unaffected (the sentinel's nio bits stay 0).  Returns
    (encoded, invalid_mask)."""
    pay_mask = jnp.uint32((1 << (nio_bits + gid_bits)) - 1)
    invalid = (fwd[-1] & jnp.uint32((1 << nio_bits) - 1)) == 0
    out = []
    for i, w in enumerate(fwd):
        sent = (jnp.uint32(0xFFFFFFFF) & ~pay_mask) if i == KW - 1 else jnp.uint32(0xFFFFFFFF)
        out.append(jnp.where(invalid, sent, w))
    return tuple(out), invalid


def sentinel_encode_unpacked(fwd: tuple, payload, KW: int):
    """Unpacked variant: all-ones key words, payload word 0 (gid 0,
    nio 0) for invalid elements (payload low 8 bits = nio).  Returns
    (keys, payload, invalid_mask)."""
    invalid = (payload & jnp.uint32(0xFF)) == 0
    keys = tuple(
        jnp.where(invalid, jnp.uint32(0xFFFFFFFF), w) for w in fwd
    )
    return keys, jnp.where(invalid, jnp.uint32(0), payload), invalid
