"""Sharded k-mer tables: shard_map + all_to_all over the "kv" mesh axis.

Replaces the reference's only scaling mechanisms — Snakemake task fan-out
and KMC's intra-process threads (SURVEY.md section 2.3) — with SPMD over a
device mesh:

- genomes stream in data-parallel slabs (one per device, k-1 halo so
  boundary-spanning k-mers are counted exactly once);
- each device extracts + locally reduces its slab, then ONE all_to_all
  exchanges (key, count) runs keyed by the fixed key-range split points;
- after the exchange each device owns a disjoint, globally-ordered key
  range, so every kmc_tools-equivalent set operation and all downstream
  algebra is shard-local; histograms finish with a psum.

Determinism: counters are integers and each shard's reduction order is
fixed by the sort, so results are identical for any device count.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache, partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..engine import ops
from ..engine.bits import (
    SENTINEL,
    key_words,
    searchsorted_words,
    take_words,
)
from ..engine.extract import extract_canonical
from ..engine.table import KmerTable
from .mesh import AXIS

NO_SAT = (1 << 31) - 1  # "no saturation yet": global cap applies post-merge


@dataclasses.dataclass
class ShardedKmerTable:
    """A KmerTable whose arrays carry a leading [n_shards] axis.

    Shard d holds keys in [split_{d-1}, split_d) sorted ascending; shard
    ranges ascend with d, so device-order concatenation is globally sorted.
    """

    table: KmerTable  # arrays shaped [D, C_local]
    mesh: Mesh

    @property
    def k(self) -> int:
        return self.table.k

    @property
    def n_shards(self) -> int:
        return self.table.counts.shape[0]

    def dump(self):
        """Globally sorted (kmer, count) records — multi-shard `dump -s`."""
        out = []
        counts = np.asarray(self.table.counts)
        words = [np.asarray(w) for w in self.table.keys]
        from ..engine.table import decode_key

        for d in range(self.n_shards):
            mask = counts[d] > 0
            kd = np.stack([w[d][mask] for w in words], axis=-1)
            cd = counts[d][mask]
            out.extend(
                (decode_key(kd[i], self.k), int(cd[i])) for i in range(kd.shape[0])
            )
        return out


def make_slabs(codes: np.ndarray, n_shards: int, k: int) -> np.ndarray:
    """Split codes into [D, chunk + k - 1] slabs with halo overlap.

    Slab d covers window starts [d*chunk, (d+1)*chunk); the k-1 halo means
    k-mers spanning slab boundaries are counted exactly once (the
    "sequence scaling" axis of SURVEY.md section 5).
    """
    n = codes.shape[0]
    chunk = max(1, math.ceil(n / n_shards))
    slab_len = chunk + k - 1
    out = np.full((n_shards, slab_len), 4, np.uint8)
    for d in range(n_shards):
        lo = d * chunk
        hi = min(n, lo + slab_len)
        if lo < n:
            out[d, : hi - lo] = codes[lo:hi]
    return out


def _dedupe_local(keys, counts, cs):
    w = len(keys)
    sorted_ops = jax.lax.sort(list(keys) + [counts], num_keys=w, is_stable=False)
    return ops.dedupe_sorted(tuple(sorted_ops[:w]), sorted_ops[w], cs)


def _partition_exchange(ukeys, ucounts, bucket_cap, n_shards, cs):
    """Range-partition local unique runs, all_to_all, merge. Returns
    (keys, counts, overflowed) with capacity n_shards * bucket_cap.

    Split points are SAMPLED from the deduped keys across all shards
    (dist/occurrence._sampled_splits) instead of the uniform-CDF table —
    skew-robust on GC-biased / repeat-heavy data (VERDICT round-1
    item 5), and identical on every device (all_gathered sample)."""
    from .occurrence import _sampled_splits

    w = len(ukeys)
    cap = ukeys[0].shape[0]
    sent = tuple(jnp.full((1,), SENTINEL, jnp.uint32) for _ in range(w))
    n_valid = searchsorted_words(ukeys, sent)[0]
    splits = _sampled_splits(ukeys, n_valid, n_shards, gid_bits=0)
    # bucket boundaries: [0, ss(split_1), ..., ss(split_{D-1}), n_unique]
    bnds = [jnp.zeros((), jnp.int32)]
    for i in range(n_shards - 1):
        q = tuple(splits[wi][i][None] for wi in range(w))
        bnds.append(searchsorted_words(ukeys, q)[0])
    bnds.append(n_valid)
    bounds = jnp.stack(bnds)  # [D+1]

    sizes = bounds[1:] - bounds[:-1]
    overflow = jnp.max(sizes) > bucket_cap

    j = jnp.arange(bucket_cap, dtype=jnp.int32)[None, :]  # [1, cap]
    idx = bounds[:-1, None] + j  # [D, cap]
    valid = idx < bounds[1:, None]
    gidx = jnp.minimum(idx, cap - 1)
    send_keys = tuple(
        jnp.where(valid, jnp.take(kw, gidx, mode="clip"), SENTINEL) for kw in ukeys
    )
    send_counts = jnp.where(valid, jnp.take(ucounts, gidx, mode="clip"), 0).astype(jnp.uint32)

    recv_keys = tuple(
        jax.lax.all_to_all(kw, AXIS, split_axis=0, concat_axis=0, tiled=True)
        for kw in send_keys
    )
    recv_counts = jax.lax.all_to_all(send_counts, AXIS, split_axis=0, concat_axis=0, tiled=True)

    flat_keys = tuple(kw.reshape(-1) for kw in recv_keys)
    flat_counts = recv_counts.reshape(-1)
    mkeys, mcounts = _dedupe_local(flat_keys, flat_counts, cs)
    overflow_any = jax.lax.pmax(overflow.astype(jnp.int32), AXIS)
    return mkeys, mcounts, overflow_any


def _count_local(slab, k, cs, bucket_cap, n_shards):
    codes = slab[0]
    keys, valid = extract_canonical(codes, k)
    ukeys, ucounts = _dedupe_local(keys, valid.astype(jnp.uint32), NO_SAT)
    mkeys, mcounts, overflow = _partition_exchange(
        ukeys, ucounts, bucket_cap, n_shards, cs
    )
    return (
        tuple(kw[None] for kw in mkeys),
        mcounts[None],
        overflow,
    )


@lru_cache(maxsize=64)
def _count_fn(mesh, k, cs, bucket_cap, n_shards):
    """Jitted shard_map for sharded counting, cached module-level so
    repeated counts reuse one traced program (VERDICT round-1 item 3)."""
    return jax.jit(
        jax.shard_map(
            partial(
                _count_local,
                k=k,
                cs=cs,
                bucket_cap=bucket_cap,
                n_shards=n_shards,
            ),
            mesh=mesh,
            in_specs=P(AXIS, None),
            out_specs=(
                tuple(P(AXIS, None) for _ in range(key_words(k))),
                P(AXIS, None),
                P(),
            ),
        )
    )


def sharded_count_codes(
    mesh: Mesh,
    codes: np.ndarray,
    k: int,
    cs: int = 255,
    bucket_cap: int | None = None,
    slack: float = 1.5,
) -> ShardedKmerTable:
    """Count canonical k-mers of one code array across the mesh.

    The result is exact and device-count-invariant; if a shard bucket
    overflows its capacity the call retries with doubled capacity.
    """
    d = mesh.devices.size
    slabs = make_slabs(np.asarray(codes, np.uint8), d, k)
    n = codes.shape[0]
    if bucket_cap is None:
        bucket_cap = max(64, int(slack * math.ceil(n / d / max(d, 1))))

    while True:
        fn = _count_fn(mesh, k, cs, bucket_cap, d)
        keys, counts, overflow = fn(jnp.asarray(slabs))
        if int(np.asarray(overflow)) == 0:
            break
        bucket_cap *= 2
    return ShardedKmerTable(
        table=KmerTable(keys=keys, counts=counts, k=k), mesh=mesh
    )


def _local_view(t: KmerTable) -> KmerTable:
    return KmerTable(keys=tuple(w[0] for w in t.keys), counts=t.counts[0], k=t.k)


def _relift(t: KmerTable) -> KmerTable:
    return KmerTable(keys=tuple(w[None] for w in t.keys), counts=t.counts[None], k=t.k)


# registry of shard-local table ops for the cached shard_map builder; each
# entry maps (param,) -> a function of local KmerTables
_SHARDWISE_OPS = {
    "union_many": lambda param: (lambda *ts: ops.union_many(list(ts), cs=param)),
    "intersect_sum": lambda param: (lambda x, y: ops.intersect_sum(x, y, cs=param)),
    "subtract": lambda param: ops.subtract,
}


@lru_cache(maxsize=256)
def _shardwise_fn(mesh, opname, param, k, n_tables):
    """Cached jitted shard_map running a registry op on every shard."""
    w = key_words(k)
    spec = (tuple(P(AXIS, None) for _ in range(w)), P(AXIS, None))
    fn = _SHARDWISE_OPS[opname](param)

    def local(*args):
        local_tables = [
            KmerTable(keys=tuple(x[0] for x in tk), counts=tc[0], k=k)
            for tk, tc in zip(args[0::2], args[1::2])
        ]
        out = fn(*local_tables)
        return tuple(x[None] for x in out.keys), out.counts[None]

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(s for _ in range(n_tables) for s in spec),
        out_specs=spec,
    )
    return jax.jit(mapped)


def _shardwise(mesh, opname, param, tables: Sequence[KmerTable]) -> KmerTable:
    """Run a registry op independently on every shard (cached program)."""
    k = tables[0].k
    flat_args = []
    for t in tables:
        flat_args += [t.keys, t.counts]
    res = _shardwise_fn(mesh, opname, param, k, len(tables))(*flat_args)
    return KmerTable(keys=res[0], counts=res[1], k=k)


def sharded_union_many(tables: List[ShardedKmerTable], cs: int = 5000) -> ShardedKmerTable:
    """n-way union with counter sum — shard-local (no collectives)."""
    mesh = tables[0].mesh
    out = _shardwise(mesh, "union_many", cs, [t.table for t in tables])
    return ShardedKmerTable(table=out, mesh=mesh)


def sharded_intersect_sum(a: ShardedKmerTable, b: ShardedKmerTable, cs: int = 255) -> ShardedKmerTable:
    out = _shardwise(a.mesh, "intersect_sum", cs, [a.table, b.table])
    return ShardedKmerTable(table=out, mesh=a.mesh)


def sharded_subtract(a: ShardedKmerTable, b: ShardedKmerTable) -> ShardedKmerTable:
    out = _shardwise(a.mesh, "subtract", None, [a.table, b.table])
    return ShardedKmerTable(table=out, mesh=a.mesh)


def sharded_set_counts(t: ShardedKmerTable, c: int) -> ShardedKmerTable:
    out = KmerTable(
        keys=t.table.keys,
        counts=jnp.where(t.table.counts > 0, jnp.uint32(c), jnp.uint32(0)),
        k=t.k,
    )
    return ShardedKmerTable(table=out, mesh=t.mesh)


@lru_cache(maxsize=256)
def _hist_fn(mesh, k, cx):
    w = key_words(k)

    def local(keys, counts):
        lt = KmerTable(keys=tuple(x[0] for x in keys), counts=counts[0], k=k)
        h = ops.histogram(lt, cx=cx)
        return jax.lax.psum(h, AXIS)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(tuple(P(AXIS, None) for _ in range(w)), P(AXIS, None)),
            out_specs=P(),
        )
    )


def sharded_histogram(t: ShardedKmerTable, cx: int = 10000) -> np.ndarray:
    """Occurrence histogram: shard-local histogram + psum over the axis."""
    return np.asarray(_hist_fn(t.mesh, t.k, cx)(t.table.keys, t.table.counts))
