"""Sharded fused genome-occurrence histogram — the multi-chip north star.

Distributes engine/occurrence.py over the "kv" mesh axis: genome slabs
stream data-parallel (k-1 halo), each device extracts canonical keys with
genome-id labels, ONE all_to_all exchanges (key, gid) pairs by the fixed
key-range split points, each shard sorts its range and runs the
distinct-gid occurrence scan, and the histogram finishes with a psum —
the whole exp1 inner loop (count per genome + union + histogram,
reference workflow/rules/exp_type_1.smk:156-191) as one SPMD program.

Determinism: integer counters and per-shard sorted reduction order make
the result identical for any device count (tested against the
single-device fused path and the oracle).
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.bits import (
    SENTINEL,
    key_words,
    searchsorted_words,
    words_eq,
    words_is_sentinel,
)
from ..engine.extract import extract_canonical
from ..engine.occurrence import (
    GID_BITS,
    _packed_occ,
    occ_words_static,
    pack_gid_static,
    pack_members,
)
from ..engine.ops import _run_sums
from .mesh import AXIS, split_keys_for


def _local_occurrence(
    slab_codes, slab_gids, k, cs, cx, n_words, n_members, n_shards, splits, bucket_cap
):
    codes = slab_codes[0]
    gids = slab_gids[0]
    keys, valid = extract_canonical(codes, k)
    gid_k = jnp.where(valid, gids, jnp.uint32(0xFFFFFFFF))
    sorted_ops = jax.lax.sort(
        list(keys) + [gid_k], num_keys=n_words + 1, is_stable=False
    )
    skeys = tuple(sorted_ops[:n_words])
    sgids = sorted_ops[n_words]

    # local (key, gid) dedupe: mark duplicate pairs absent to cut exchange
    prev_keys = tuple(jnp.roll(w, 1) for w in skeys)
    key_new = ~words_eq(skeys, prev_keys)
    key_new = key_new.at[0].set(True)
    pair_new = key_new | (sgids != jnp.roll(sgids, 1))

    # range-partition boundaries over the sorted keys
    bnds = [jnp.zeros((), jnp.int32)]
    for i in range(n_shards - 1):
        q = tuple(jnp.full((1,), splits[i, wi], jnp.uint32) for wi in range(n_words))
        bnds.append(searchsorted_words(skeys, q)[0])
    sent_q = tuple(jnp.full((1,), SENTINEL, jnp.uint32) for _ in range(n_words))
    bnds.append(searchsorted_words(skeys, sent_q)[0])
    bounds = jnp.stack(bnds)

    sizes = bounds[1:] - bounds[:-1]
    overflow = jnp.max(sizes) > bucket_cap

    j = jnp.arange(bucket_cap, dtype=jnp.int32)[None, :]
    idx = bounds[:-1, None] + j
    in_range = idx < bounds[1:, None]
    gidx = jnp.minimum(idx, skeys[0].shape[0] - 1)
    keep = in_range & jnp.take(pair_new, gidx, mode="clip")
    send_keys = tuple(
        jnp.where(keep, jnp.take(w, gidx, mode="clip"), SENTINEL) for w in skeys
    )
    send_gids = jnp.where(keep, jnp.take(sgids, gidx, mode="clip"), jnp.uint32(0xFFFFFFFF))

    recv_keys = tuple(
        jax.lax.all_to_all(w, AXIS, split_axis=0, concat_axis=0, tiled=True)
        for w in send_keys
    )
    recv_gids = jax.lax.all_to_all(send_gids, AXIS, split_axis=0, concat_axis=0, tiled=True)

    flat_keys = tuple(w.reshape(-1) for w in recv_keys)
    flat_gids = recv_gids.reshape(-1)
    merged = jax.lax.sort(
        list(flat_keys) + [flat_gids], num_keys=n_words + 1, is_stable=False
    )
    mkeys = tuple(merged[:n_words])
    mgids = merged[n_words]

    mprev = tuple(jnp.roll(w, 1) for w in mkeys)
    mkey_new = ~words_eq(mkeys, mprev)
    mkey_new = mkey_new.at[0].set(True)
    sub_start = (mkey_new | (mgids != jnp.roll(mgids, 1))).astype(jnp.uint32)
    occ = _run_sums(sub_start, mkey_new)
    occ = jnp.minimum(occ, jnp.uint32(cs))
    occ = jnp.where(words_is_sentinel(mkeys), 0, occ)

    max_occ = min(n_members, cx)
    bins = [jnp.sum((occ == b).astype(jnp.int32)) for b in range(1, max_occ + 1)]
    hist = jnp.zeros((cx,), jnp.int32).at[:max_occ].set(jnp.stack(bins))
    hist = jax.lax.psum(hist, AXIS)
    overflow_any = jax.lax.pmax(overflow.astype(jnp.int32), AXIS)
    return hist, overflow_any


def split_keys_packed(k: int, n_shards: int) -> np.ndarray:
    """Packed-form split points: (split_key << GID_BITS) over the packed
    word count, so range partitioning by packed value equals partitioning
    by key (gid bits below the shift never affect the range)."""
    from .mesh import _fraction_to_key  # reuse the canonical-CDF quantiles

    ow = occ_words_static(k)
    out = np.zeros((max(n_shards - 1, 0), ow), np.uint32)
    for i in range(1, n_shards):
        frac = 1.0 - math.sqrt(1.0 - i / n_shards)
        kw = _fraction_to_key(frac, k)
        v = 0
        for word in kw:
            v = (v << 32) | int(word)
        v <<= GID_BITS
        for wi in range(ow):
            out[i - 1, wi] = (v >> (32 * (ow - 1 - wi))) & 0xFFFFFFFF
    return out


def _local_occurrence_packed(
    slab_codes, slab_gids, k, cs, cx, n_members, n_shards, splits, bucket_cap
):
    """Gid-packed variant of _local_occurrence: the (key, gid) pair rides in
    occ_words_static(k) words through both sorts AND the all_to_all, cutting
    sort operands and ICI exchange volume by 1-2 words/element for the whole
    reference k grid (engine/occurrence.py GID_BITS rationale)."""
    ow = occ_words_static(k)
    codes = slab_codes[0]
    gids = slab_gids[0]
    keys, valid = extract_canonical(codes, k)
    packed = pack_gid_static(keys, valid, gids, k)
    sp = tuple(jax.lax.sort(list(packed), num_keys=ow, is_stable=False))

    # local (key, gid) dedupe: mark duplicate pairs absent to cut exchange
    prev = tuple(jnp.roll(w, 1) for w in sp)
    pair_new = (~words_eq(sp, prev)).at[0].set(True)

    bnds = [jnp.zeros((), jnp.int32)]
    for i in range(n_shards - 1):
        q = tuple(jnp.full((1,), splits[i, wi], jnp.uint32) for wi in range(ow))
        bnds.append(searchsorted_words(sp, q)[0])
    sent_q = tuple(jnp.full((1,), SENTINEL, jnp.uint32) for _ in range(ow))
    bnds.append(searchsorted_words(sp, sent_q)[0])
    bounds = jnp.stack(bnds)

    sizes = bounds[1:] - bounds[:-1]
    overflow = jnp.max(sizes) > bucket_cap

    j = jnp.arange(bucket_cap, dtype=jnp.int32)[None, :]
    idx = bounds[:-1, None] + j
    in_range = idx < bounds[1:, None]
    gidx = jnp.minimum(idx, sp[0].shape[0] - 1)
    keep = in_range & jnp.take(pair_new, gidx, mode="clip")
    send = tuple(
        jnp.where(keep, jnp.take(w, gidx, mode="clip"), SENTINEL) for w in sp
    )
    recv = tuple(
        jax.lax.all_to_all(w, AXIS, split_axis=0, concat_axis=0, tiled=True)
        for w in send
    )
    flat = tuple(w.reshape(-1) for w in recv)
    sm = tuple(jax.lax.sort(list(flat), num_keys=ow, is_stable=False))
    occ = _packed_occ(sm, cs, ow)

    max_occ = min(n_members, cx)
    bins = [jnp.sum((occ == b).astype(jnp.int32)) for b in range(1, max_occ + 1)]
    hist = jnp.zeros((cx,), jnp.int32).at[:max_occ].set(jnp.stack(bins))
    hist = jax.lax.psum(hist, AXIS)
    overflow_any = jax.lax.pmax(overflow.astype(jnp.int32), AXIS)
    return hist, overflow_any


def _make_slab_pair(codes: np.ndarray, gids: np.ndarray, n_shards: int, k: int):
    n = codes.shape[0]
    chunk = max(1, math.ceil(n / n_shards))
    slab_len = chunk + k - 1
    cs_out = np.full((n_shards, slab_len), 4, np.uint8)
    gs_out = np.zeros((n_shards, slab_len), np.uint32)
    for d in range(n_shards):
        lo = d * chunk
        hi = min(n, lo + slab_len)
        if lo < n:
            cs_out[d, : hi - lo] = codes[lo:hi]
            gs_out[d, : hi - lo] = gids[lo:hi]
    return cs_out, gs_out


def sharded_occurrence_histogram(
    mesh: Mesh,
    member_codes: Sequence[np.ndarray],
    k: int,
    cs: int = 5000,
    cx: int = 10000,
    bucket_cap: int | None = None,
    slack: float = 1.5,
) -> List[int]:
    """Multi-device equivalent of engine.occurrence.occurrence_histogram."""
    d = mesh.devices.size
    codes, gids = pack_members(member_codes)
    slab_codes, slab_gids = _make_slab_pair(codes, gids, d, k)
    n = codes.shape[0]
    if bucket_cap is None:
        bucket_cap = max(64, int(slack * math.ceil(n / d / max(d, 1))))

    packed_gid = len(member_codes) <= (1 << GID_BITS)
    while True:
        if packed_gid:
            local = partial(
                _local_occurrence_packed,
                k=k,
                cs=cs,
                cx=cx,
                n_members=len(member_codes),
                n_shards=d,
                splits=split_keys_packed(k, d),
                bucket_cap=bucket_cap,
            )
        else:
            local = partial(
                _local_occurrence,
                k=k,
                cs=cs,
                cx=cx,
                n_words=key_words(k),
                n_members=len(member_codes),
                n_shards=d,
                splits=split_keys_for(k, d),
                bucket_cap=bucket_cap,
            )
        fn = jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(AXIS, None), P(AXIS, None)),
                out_specs=(P(), P()),
            )
        )
        hist, overflow = fn(jnp.asarray(slab_codes), jnp.asarray(slab_gids))
        if int(np.asarray(overflow)) == 0:
            break
        bucket_cap *= 2
    return np.asarray(hist).tolist()
