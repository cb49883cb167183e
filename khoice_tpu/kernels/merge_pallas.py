"""Pallas TPU merge-path sort: VMEM row sorts + bandwidth-bound merges.

The flat `jax.lax.sort` at the master-sweep shape (35.6M x 4 uint32
operands) costs ~229 ms and is the dominant device cost of the whole k
grid (BENCH_PROTOCOL.json).  Honest microbenchmarks
(tools/microbench_fastsort.py) show batched ROW sorts whose rows fit
VMEM run the same comparator at ~37-64 ms — the flat sort's cost is the
O(log^2 n) bitonic network paying HBM per stage.  This module finishes
the job with a classic merge sort whose every level is ONE pass:

1. local phase (XLA): reshape to [R, C] rows, `lax.sort` each row in
   VMEM -> R sorted runs;
2. merge levels: pairs of adjacent runs merge via MERGE-PATH
   partitioning — for every output tile of T elements, XLA computes by
   vectorized binary search the exact slice each input run contributes
   (co-ranks), then a Pallas kernel DMA-copies the two slices from
   their dynamic offsets into VMEM, bitonic-MERGES 2T elements entirely
   in VMEM (log2(2T) compare-exchange stages over a (128, 128) register
   tile), and writes the output tile.  A level therefore reads and
   writes each element once (plus the T-element over-read per tile) —
   bandwidth-bound, not network-bound.
3. odd run counts pass the trailing run through as tiles with an empty
   B slice — the kernel is agnostic to level structure; all pair
   bookkeeping lives in static Python, only co-ranks are data-dependent.

Ties: co-ranks split equal-key groups with a consistent A-first
convention, so tiles partition the output exactly; within a tile the
bitonic merge orders ties arbitrarily — the same semantics as
`lax.sort(is_stable=False)` (payload operands travel with their
element; their order within equal keys is unspecified).

STATUS (round 5): RETIRED as a replacement candidate — kept as a
correct, exactness-pinned scaffold (tests/test_merge_sort.py; full-size
hardware equality verified on the chip).  Fresh round-5 measurements
(tools/microbench_mergesort.py) and the full post-mortem live in
BASELINE.md: XLA's own compare-exchange stage cost (0.45 ms/stage at
the master shape) puts a PERFECT merge-path at ~166 ms vs the flat
sort's 229 ms — below the flat sort but above the round-4 target
(~120 ms), and 3-4x below this kernel's measured ~2.0 ms/stage network
(the linearized (128,128) layout makes sub-lane shuffles 3-roll
composites and the 5-plane flag-led comparator costs ~50 VPU
ops/element/stage).  The hot path keeps the flat sort
(engine/ksweep._sweep_doubled).
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_TILE = 8192          # output elements per kernel tile
ROWS2, COLS = 128, 128  # 2T working tile layout (row-major)


# ---------------------------------------------------------------------------
# in-kernel linear rolls over the (128, 128) row-major tile
# ---------------------------------------------------------------------------


def _lin_shift_up(x, d):
    """y[i] = x[i + d] (cyclic; callers never select wrapped lanes).

    d must be < COLS or a multiple of COLS.  pltpu.roll only takes
    non-negative shifts, so "up" rolls by (size - d)."""
    rows = x.shape[0]
    if d % COLS == 0:
        return pltpu.roll(x, shift=rows - d // COLS, axis=0)
    assert d < COLS
    a = pltpu.roll(x, shift=COLS - d, axis=1)
    b = pltpu.roll(pltpu.roll(x, shift=rows - 1, axis=0), shift=COLS - d, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < COLS - d, a, b)


def _lin_shift_down(x, d):
    """y[i] = x[i - d] (cyclic)."""
    if d % COLS == 0:
        return pltpu.roll(x, shift=d // COLS, axis=0)
    assert d < COLS
    a = pltpu.roll(x, shift=d, axis=1)
    b = pltpu.roll(pltpu.roll(x, shift=1, axis=0), shift=d, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col >= d, a, b)


def _xor_shuffle(x, d, axis):
    """y[idx] = x[idx ^ d] along `axis` (d a power of two < size)."""
    size = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    up = pltpu.roll(x, shift=size - d, axis=axis)    # x[i + d]
    down = pltpu.roll(x, shift=d, axis=axis)         # x[i - d]
    return jnp.where((idx & d) == 0, up, down)


def _reverse2d(x):
    """Full linear reversal of a row-major (R, C) tile: i -> RC-1-i.

    = XOR of the linear index with RC-1 = lane XOR (C-1) then row XOR
    (R-1), each a log2 chain of xor-shuffles."""
    d = 1
    while d < x.shape[1]:
        x = _xor_shuffle(x, d, axis=1)
        d *= 2
    d = 1
    while d < x.shape[0]:
        x = _xor_shuffle(x, d, axis=0)
        d *= 2
    return x


def _lex_lt_eq(a: list, b: list):
    lt = jnp.zeros_like(a[0], dtype=jnp.bool_)
    eq = jnp.ones_like(a[0], dtype=jnp.bool_)
    for x, y in zip(a, b):
        lt = lt | (eq & (x < y))
        eq = eq & (x == y)
    return lt, eq


ALIGN = 1024  # Mosaic's 1D HBM tiling: DMA offsets must be multiples
WIN = T_TILE + ALIGN  # aligned over-window per slice
WIN_ROWS = WIN // COLS  # 72


def _rot_take(buf2, off):
    """rows [0:64) of buf2 ((72, 128)) linearly rotated up by dynamic
    off < 1024: y[j] = buf[j + off], via a dynamic row roll plus a
    dynamic lane roll with row carry."""
    rows = buf2.shape[0]
    q = off // COLS
    r = off % COLS
    a = pltpu.roll(buf2, shift=rows - q, axis=0)
    b = pltpu.roll(a, shift=COLS - r, axis=1)
    c = pltpu.roll(pltpu.roll(a, shift=rows - 1, axis=0), shift=COLS - r, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, buf2.shape, 1)
    y = jnp.where(col < COLS - r, b, c)
    return y[: T_TILE // COLS]


def _merge_kernel(srcA_ref, srcB_ref, na_ref, *refs, n_ops, nk):
    # refs: n_ops HBM inputs (ANY), out (n_ops blocks), scratch:
    # n_ops bufA (WIN,), n_ops bufB (WIN,), 2 DMA sems
    t = pl.program_id(0)
    x_refs = refs[:n_ops]
    out_refs = refs[n_ops : 2 * n_ops]
    bufA = refs[2 * n_ops : 3 * n_ops]
    bufB = refs[3 * n_ops : 4 * n_ops]
    semA, semB = refs[4 * n_ops], refs[4 * n_ops + 1]

    srcA = srcA_ref[t]
    srcB = srcB_ref[t]
    na = na_ref[t]
    # Mosaic proves DMA-offset divisibility from the expression itself:
    # keep the //ALIGN*ALIGN inline
    alA = srcA // ALIGN * ALIGN
    alB = srcB // ALIGN * ALIGN
    offA = srcA - alA
    offB = srcB - alB

    for i in range(n_ops):
        pltpu.make_async_copy(
            x_refs[i].at[pl.ds(alA, WIN)], bufA[i], semA
        ).start()
    for i in range(n_ops):
        pltpu.make_async_copy(
            x_refs[i].at[pl.ds(alB, WIN)], bufB[i], semB
        ).start()
    for i in range(n_ops):
        pltpu.make_async_copy(
            x_refs[i].at[pl.ds(alA, WIN)], bufA[i], semA
        ).wait()
    for i in range(n_ops):
        pltpu.make_async_copy(
            x_refs[i].at[pl.ds(alB, WIN)], bufB[i], semB
        ).wait()

    half_rows = T_TILE // COLS  # 64
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (half_rows, COLS), 0) * COLS
        + jax.lax.broadcasted_iota(jnp.int32, (half_rows, COLS), 1)
    )

    # A ascending + reverse(B) descending form a bitonic 2T sequence.
    # The first merge stage (distance T) pairs position i with i+T =
    # ELEMENTWISE min between A and reverse(B); after it, the low half
    # is bitonic and below everything above — and since exactly
    # na + nb = T slots are real, the first T of the merge (= the output
    # tile) is entirely the LOW half, so the remaining log2(T) stages
    # run on (64, 128) only.  Mosaic has no rev; reverse(B) = 13
    # xor-shuffle roll steps (i -> T-1-i is XOR with T-1: 7 lane
    # distances + 6 row distances).
    #
    # Masked slots (j >= na / j >= nb) carry a VALIDITY FLAG plane that
    # leads the comparator: garbage beyond a slice's end — or even a
    # real element whose key is legitimately all-ones — can never
    # displace a real element; keys of masked slots are also forced
    # all-ones so each half stays monotone under (flag, key) order.
    nb = T_TILE - na
    a_w, r_w = [], []
    for i in range(n_ops):
        a2 = _rot_take(bufA[i][...].reshape(WIN_ROWS, COLS), offA)
        b2 = _rot_take(bufB[i][...].reshape(WIN_ROWS, COLS), offB)
        if i < nk:
            a2 = jnp.where(lin >= na, jnp.uint32(0xFFFFFFFF), a2)
            b2 = jnp.where(lin >= nb, jnp.uint32(0xFFFFFFFF), b2)
        a_w.append(a2)
        r_w.append(_reverse2d(b2))
    fa = (lin >= na).astype(jnp.uint32)
    fr = _reverse2d((lin >= nb).astype(jnp.uint32))

    def cmp_list(flag, ws):
        return [flag] + list(ws[:nk])

    lt, _ = _lex_lt_eq(cmp_list(fr, r_w), cmp_list(fa, a_w))
    words = [jnp.where(lt, r, a) for r, a in zip(r_w, a_w)]
    flag = jnp.where(lt, fr, fa)

    d = T_TILE // 2
    while d >= 1:
        log2d = d.bit_length() - 1
        sel_low = ((lin >> log2d) & 1) == 0
        partners = [
            jnp.where(sel_low, _lin_shift_up(w, d), _lin_shift_down(w, d))
            for w in words
        ]
        pflag = jnp.where(sel_low, _lin_shift_up(flag, d), _lin_shift_down(flag, d))
        lt, eq = _lex_lt_eq(cmp_list(pflag, partners), cmp_list(flag, words))
        gt = ~lt & ~eq
        take = (sel_low & lt) | (~sel_low & gt)
        words = [jnp.where(take, p, w) for p, w in zip(partners, words)]
        flag = jnp.where(take, pflag, flag)
        d //= 2

    for i in range(n_ops):
        out_refs[i][...] = words[i].reshape(-1)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _merge_level(srcA, srcB, na, n, n_ops, nk, interpret, *x):
    n_tiles = n // T_TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_ops)],
        out_specs=[
            pl.BlockSpec((T_TILE,), lambda t, *_: (t,), memory_space=pltpu.VMEM)
            for _ in range(n_ops)
        ],
        scratch_shapes=(
            [pltpu.VMEM((WIN,), jnp.uint32) for _ in range(2 * n_ops)]
            + [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
        ),
    )
    out = pl.pallas_call(
        functools.partial(_merge_kernel, n_ops=n_ops, nk=nk),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n,), jnp.uint32) for _ in range(n_ops)],
        interpret=interpret,
    )(srcA, srcB, na, *x)
    return tuple(out)


# ---------------------------------------------------------------------------
# co-rank search (XLA, vectorized over all tile boundaries of a level)
# ---------------------------------------------------------------------------


def _take_words(xw, idx):
    return [jnp.take(w, idx, mode="clip") for w in xw]


def _lex_le_at(xw, i, j, nk):
    """x[i] <= x[j] lexicographically over the first nk words (vector)."""
    a = _take_words(xw[:nk], i)
    b = _take_words(xw[:nk], j)
    lt, eq = _lex_lt_eq(b, a)  # b < a
    return ~lt  # a <= b


def _coranks(xw, nk, Astart, Alen, Bstart, Blen, o, iters):
    """Vectorized merge-path co-rank: number of A elements among the
    first o of merge(A, B) with A-first tie priority (A[i] precedes
    B[j] iff A[i] <= B[j]).  All arguments are int32 vectors over tile
    boundaries; Alen/Blen may differ per entry (unequal final pairs,
    pass-through runs with Blen == 0).

    Bisection on the monotone predicate
        TooSmall(a) := a < Alen  and  o-a > 0  and  A[a] <= B[o-a-1]
    (if A[a] <= B[o-a-1], A-priority would have taken A[a] before
    B[o-a-1], so more than a A-elements are in the prefix)."""
    lo = jnp.maximum(0, o - Blen)
    hi = jnp.minimum(o, Alen)

    def body(_, lohi):
        lo, hi = lohi
        a = (lo + hi) // 2
        b = o - a
        le = _lex_le_at(xw, Astart + a, Bstart + b - 1, nk)
        too_small = (a < Alen) & (b > 0) & le
        lo2 = jnp.where(too_small, a + 1, lo)
        hi2 = jnp.where(too_small, hi, a)
        active = lo < hi
        return (jnp.where(active, lo2, lo), jnp.where(active, hi2, hi))

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


# ---------------------------------------------------------------------------
# full sort
# ---------------------------------------------------------------------------


def _plan_levels(n_runs: int) -> List[List[Tuple[int, int]]]:
    """Static merge schedule: list of levels, each a list of
    (run_index_a, run_index_b_or_-1) pairs over the previous level's
    runs (in order); -1 = pass-through."""
    levels = []
    runs = n_runs
    while runs > 1:
        pairs = []
        i = 0
        while i + 1 < runs:
            pairs.append((i, i + 1))
            i += 2
        if i < runs:
            pairs.append((i, -1))
        levels.append(pairs)
        runs = len(pairs)
    return levels


def merge_sort(x: Sequence[jnp.ndarray], nk: int, row_len: int = T_TILE,
               interpret: bool = False):
    """Sort uint32 operand arrays by the first nk words — lax.sort
    semantics (unstable; payload operands past nk travel along).

    Requires n % row_len == 0 and row_len % T_TILE == 0; callers
    fall back to lax.sort otherwise."""
    x = tuple(x)
    n = int(x[0].shape[0])
    n_ops = len(x)
    assert n % row_len == 0 and row_len % T_TILE == 0
    n_runs = n // row_len

    rows = jax.lax.sort(
        [w.reshape(n_runs, row_len) for w in x],
        dimension=1, num_keys=nk, is_stable=False,
    )
    cur = tuple(w.reshape(-1) for w in rows)
    run_lens = [row_len] * n_runs
    iters = max(18, int(math.ceil(math.log2(n + 1))) + 1)

    for pairs in _plan_levels(n_runs):
        starts = np.cumsum([0] + run_lens)[:-1]
        # per-tile static tables
        tAstart, tAlen, tBstart, tBlen, tO = [], [], [], [], []
        new_lens = []
        out_off = 0
        for ia, ib in pairs:
            la = run_lens[ia]
            lb = run_lens[ib] if ib >= 0 else 0
            sa = int(starts[ia])
            sb = int(starts[ib]) if ib >= 0 else 0
            for j in range((la + lb) // T_TILE):
                tAstart.append(sa)
                tAlen.append(la)
                tBstart.append(sb)
                tBlen.append(lb)
                tO.append(j * T_TILE)
            new_lens.append(la + lb)
            out_off += la + lb
        Astart = jnp.asarray(tAstart, jnp.int32)
        Alen = jnp.asarray(tAlen, jnp.int32)
        Bstart = jnp.asarray(tBstart, jnp.int32)
        Blen = jnp.asarray(tBlen, jnp.int32)
        O = jnp.asarray(tO, jnp.int32)

        xp = tuple(
            jnp.concatenate([w, jnp.full((WIN,), 0xFFFFFFFF, jnp.uint32)])
            for w in cur
        )
        a0 = _coranks(xp, nk, Astart, Alen, Bstart, Blen, O, iters)
        a1 = _coranks(xp, nk, Astart, Alen, Bstart, Blen, O + T_TILE, iters)
        na = a1 - a0
        srcA = Astart + a0
        srcB = Bstart + (O - a0)

        cur = _merge_level(srcA, srcB, na, n, n_ops, nk, interpret, *xp)
        run_lens = new_lens

    return cur
