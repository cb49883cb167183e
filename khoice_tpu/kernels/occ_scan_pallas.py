"""Pallas TPU kernel: fused occurrence scan + histogram over sorted runs.

Input: (key words, gid) arrays sorted by (key, gid) — the output of the
single fused sort in engine/occurrence.py. Output: hist[b-1] = number of
distinct keys with exactly b distinct gids (the exp1 within/across-group
occurrence histogram, reference workflow/rules/exp_type_1.smk:184-191).

Replaces the XLA chain (rolls + cumsum + reverse cummin + per-bin
reductions over the full array) with ONE pass:

- per tile, vectorized masks: key_new (run boundary), pair_new (distinct
  (key,gid) start), excluding SENTINEL padding;
- a log2(T)-step *segmented* inclusive scan ranks each pair-start within
  its key run (Hillis-Steele with boundary kill), with a cross-tile carry
  for runs spanning tiles (sequential TPU grid + SMEM carries);
- identity: #runs with occ >= b == #pair-starts with rank == b, so per-bin
  compare-reductions accumulate the cumulative histogram in VMEM scratch
  and the final step writes the difference.

Exact; validated against the XLA path and the oracle (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.bits import key_words

TILE = 64 * 1024
BINS_PAD = 128  # padded bin-lane width (supports n_members <= 128)


def _roll_right(x, s):
    """x shifted right by s lanes along axis 1, zeros shifted in."""
    rolled = pltpu.roll(x, shift=s, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= s, rolled, jnp.zeros_like(x))


def _kernel(*refs, n_words: int, n_bins: int):
    # refs: key words [w], gids, hist_out, carry_smem, cum_vmem
    ins = refs[: n_words + 1]
    hist_out = refs[n_words + 1]
    carry = refs[n_words + 2]   # SMEM [n_words + 2]: prev key, prev gid, rank
    cum = refs[n_words + 3]     # VMEM [1, BINS_PAD] accumulated cumulative hist
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        for wi in range(n_words):
            carry[wi] = jnp.uint32(0xFFFFFFFF)
        carry[n_words] = jnp.uint32(0xFFFFFFFF)
        carry[n_words + 1] = jnp.uint32(0)
        cum[:] = jnp.zeros((1, BINS_PAD), jnp.int32)

    keys = [ins[wi][:] for wi in range(n_words)]
    gids = ins[n_words][:]

    # previous element (first lane takes the carried scalars)
    lane = jax.lax.broadcasted_iota(jnp.int32, gids.shape, 1)
    first = lane == 0
    prev_keys = [
        jnp.where(first, jnp.full_like(keys[wi], carry[wi]), _roll_right(keys[wi], 1))
        for wi in range(n_words)
    ]
    prev_gid = jnp.where(
        first, jnp.full_like(gids, carry[n_words]), _roll_right(gids, 1)
    )

    key_eq = jnp.ones_like(gids, dtype=jnp.bool_)
    for wi in range(n_words):
        key_eq = key_eq & (keys[wi] == prev_keys[wi])
    key_new = ~key_eq
    pair_new = key_new | (gids != prev_gid)

    sent = jnp.ones_like(gids, dtype=jnp.bool_)
    for wi in range(n_words):
        sent = sent & (keys[wi] == jnp.uint32(0xFFFFFFFF))
    pair_new = pair_new & ~sent

    # segmented inclusive scan of pair_new with resets at key_new
    v = pair_new.astype(jnp.int32)
    b = key_new
    s = 1
    while s < TILE:
        # zero/False shift-in (identity) keeps prefix semantics at the
        # tile edge; the cross-tile carry is injected separately below
        v_sh = _roll_right(v, s)
        b_sh = _roll_right(b.astype(jnp.int32), s) > 0
        v = v + jnp.where(b, 0, v_sh)
        b = b | b_sh
        s *= 2
    # inject cross-tile carry into the first (still-open) segment:
    # positions with no key_new anywhere before them in this tile
    no_boundary_before = ~b  # after full scan, b[p] == any key_new in [0..p]
    rank = v + jnp.where(no_boundary_before, carry[n_words + 1].astype(jnp.int32), 0)

    # cumulative histogram: #pair-starts with rank == b  (b = 1..n_bins)
    # (one-hot accumulate — Mosaic has no scatter)
    bin_lane = jax.lax.broadcasted_iota(jnp.int32, (1, BINS_PAD), 1)
    upd_vec = jnp.zeros((1, BINS_PAD), jnp.int32)
    for bb in range(1, n_bins + 1):
        cnt = jnp.sum((pair_new & (rank == bb)).astype(jnp.int32))
        upd_vec = upd_vec + jnp.where(bin_lane == bb - 1, cnt, 0)
    cum[:] = cum[:] + upd_vec

    # update carries from the tile's last lane
    last = TILE - 1
    for wi in range(n_words):
        carry[wi] = keys[wi][0, last]
    carry[n_words] = gids[0, last]
    carry[n_words + 1] = rank[0, last].astype(jnp.uint32)

    @pl.when(i == n_prog - 1)
    def _():
        c = cum[:]
        nxt = jnp.concatenate(
            [c[:, 1:], jnp.zeros((1, 1), jnp.int32)], axis=1
        )
        hist_out[:] = c - nxt


def _kernel_packed(*refs, n_words: int, n_bins: int, gid_bits: int):
    # refs: packed words [w], hist_out, carry_smem, cum_vmem
    # Packed layout: value = (canonical key << gid_bits) | gid, so ordering
    # by packed value == ordering by (key, gid); key identity = all words
    # equal with the LAST word compared above its gid_bits.
    ins = refs[:n_words]
    hist_out = refs[n_words]
    carry = refs[n_words + 1]   # SMEM [n_words + 1]: prev packed words, rank
    cum = refs[n_words + 2]     # VMEM [1, BINS_PAD]
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        for wi in range(n_words):
            carry[wi] = jnp.uint32(0xFFFFFFFF)
        carry[n_words] = jnp.uint32(0)
        cum[:] = jnp.zeros((1, BINS_PAD), jnp.int32)

    words = [ins[wi][:] for wi in range(n_words)]
    lane = jax.lax.broadcasted_iota(jnp.int32, words[0].shape, 1)
    first = lane == 0
    prev = [
        jnp.where(first, jnp.full_like(words[wi], carry[wi]), _roll_right(words[wi], 1))
        for wi in range(n_words)
    ]

    pair_eq = jnp.ones_like(words[0], dtype=jnp.bool_)
    for wi in range(n_words):
        pair_eq = pair_eq & (words[wi] == prev[wi])
    key_eq = (words[n_words - 1] >> gid_bits) == (prev[n_words - 1] >> gid_bits)
    for wi in range(n_words - 1):
        key_eq = key_eq & (words[wi] == prev[wi])
    key_new = ~key_eq
    pair_new = ~pair_eq

    sent = jnp.ones_like(words[0], dtype=jnp.bool_)
    for wi in range(n_words):
        sent = sent & (words[wi] == jnp.uint32(0xFFFFFFFF))
    pair_new = pair_new & ~sent

    v = pair_new.astype(jnp.int32)
    b = key_new
    s = 1
    while s < TILE:
        v_sh = _roll_right(v, s)
        b_sh = _roll_right(b.astype(jnp.int32), s) > 0
        v = v + jnp.where(b, 0, v_sh)
        b = b | b_sh
        s *= 2
    no_boundary_before = ~b
    rank = v + jnp.where(no_boundary_before, carry[n_words].astype(jnp.int32), 0)

    bin_lane = jax.lax.broadcasted_iota(jnp.int32, (1, BINS_PAD), 1)
    upd_vec = jnp.zeros((1, BINS_PAD), jnp.int32)
    for bb in range(1, n_bins + 1):
        cnt = jnp.sum((pair_new & (rank == bb)).astype(jnp.int32))
        upd_vec = upd_vec + jnp.where(bin_lane == bb - 1, cnt, 0)
    cum[:] = cum[:] + upd_vec

    last = TILE - 1
    for wi in range(n_words):
        carry[wi] = words[wi][0, last]
    carry[n_words] = rank[0, last].astype(jnp.uint32)

    @pl.when(i == n_prog - 1)
    def _():
        c = cum[:]
        nxt = jnp.concatenate(
            [c[:, 1:], jnp.zeros((1, 1), jnp.int32)], axis=1
        )
        hist_out[:] = c - nxt


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def occ_hist_packed_pallas(
    packed: tuple, n_bins: int, gid_bits: int, interpret: bool = False
):
    """hist[b-1] = #distinct keys with exactly b distinct gids, from sorted
    gid-packed words (value = key << gid_bits | gid, SENTINEL padding,
    length a multiple of TILE)."""
    w = len(packed)
    n = packed[0].shape[0]
    assert n % TILE == 0, f"length {n} not a multiple of {TILE}"
    assert n_bins <= BINS_PAD
    grid = n // TILE

    ins = [p.reshape(1, n) for p in packed]
    in_specs = [
        pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
        for _ in range(w)
    ]
    out = pl.pallas_call(
        functools.partial(_kernel_packed, n_words=w, n_bins=n_bins, gid_bits=gid_bits),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BINS_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, BINS_PAD), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((w + 1,), jnp.uint32),
            pltpu.VMEM((1, BINS_PAD), jnp.int32),
        ],
        interpret=interpret,
    )(*ins)
    return out[0, :n_bins]


@functools.partial(jax.jit, static_argnums=(2, 3))
def occ_hist_pallas(keys: tuple, gids: jnp.ndarray, n_bins: int, interpret: bool = False):
    """hist[b-1] = #distinct keys with exactly b distinct gids, b=1..n_bins.

    keys/gids must be sorted by (key, gid) with SENTINEL padding, length a
    multiple of TILE (pad with sentinels).
    """
    w = len(keys)
    n = gids.shape[0]
    assert n % TILE == 0, f"length {n} not a multiple of {TILE}"
    assert n_bins <= BINS_PAD
    grid = n // TILE

    ins = [k.reshape(1, n) for k in keys] + [gids.reshape(1, n)]
    in_specs = [
        pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
        for _ in range(w + 1)
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, n_words=w, n_bins=n_bins),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BINS_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, BINS_PAD), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((w + 2,), jnp.uint32),
            pltpu.VMEM((1, BINS_PAD), jnp.int32),
        ],
        interpret=interpret,
    )(*ins)
    return out[0, :n_bins]
