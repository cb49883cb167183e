"""Pallas TPU kernel: multi-k occurrence scan over ONE shared-sorted array.

Consumes the doubled-text forward-kmax sort of engine/ksweep.py (key words
MSB-first, left-aligned; payload gid/nio either in a separate word or
packed into the last key word's spare bits) and produces, for EVERY k in a
static list at once, the doubled + palindromic occurrence histograms
(hist[b-1] = #runs whose distinct-gid count is b).  engine/ksweep.py
combines them into canonical histograms ((d + pal) / 2), replacing the
reference's per-k kmc+union+histogram chain
(workflow/rules/exp_type_1.smk:156-191) with one pass per ~15 ks.

Per element and per k the work is a segmented OR-scan of one-hot gid
bitmasks with segment resets at k-run boundaries (top-2k-bit changes).
Efficiency tricks:

- masks need only n_members <= 32 bits, so SEVERAL ks share one u32 scan
  word (8/16/32-bit subfields): the scan — the expensive part — is paid
  once per WORD, not per k.  Boundary resets stay per-k because the kill
  mask K (all-ones per killed subfield) propagates through the same scan:
  v |= v_sh & ~K; K |= K_sh.
- the tile is laid out (128 rows x 128 lanes) in row-major linear order
  and the segmented scan runs TWO-LEVEL: 7 masked-roll steps within rows,
  then a 7-step scan of the 128 row summaries on a (128, 1) column, then
  one combine — ~7 full-tile steps instead of the 14 a flat
  Hillis-Steele over 16384 lanes needs (the kernel is VPU-bound, so scan
  steps on the full tile dominate device time).

Run closes are counted at run STARTS (the element where key_new_k fires
charges the PREVIOUS element's scanned OR value), which makes tile
boundaries uniform: the first element reads the carried OR/pal/key from
SMEM.  A final fixup at the last tile closes the still-open run of each k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.ksweep import PACK_GID_BITS, PACK_NIO_BITS

ROWS = 128
COLS = 128
TILE = ROWS * COLS  # 16384, small enough that live scan state fits VMEM
BINS_PAD = 128
MAX_KS_PER_CALL = 15


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _col_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _roll_right_cols(x, s):
    """Shift right by s within each row, zero-filling the first s cols."""
    rolled = pltpu.roll(x, shift=s, axis=1)
    return jnp.where(_col_iota(x.shape) >= s, rolled, jnp.zeros_like(x))


def _roll_down_rows(x, s):
    """Shift down by s rows, zero-filling the first s rows ((R, 1) cols)."""
    rolled = pltpu.roll(x, shift=s, axis=0)
    return jnp.where(_row_iota(x.shape) >= s, rolled, jnp.zeros_like(x))


def _shift_lin1(x, first_vals):
    """Previous element in ROW-MAJOR linear order: (r, c-1), wrapping to
    (r-1, COLS-1) at column 0. first_vals (broadcastable) supplies element
    (0, 0)."""
    rolled = pltpu.roll(x, shift=1, axis=1)
    last_col = x[:, COLS - 1 : COLS]
    prev_last = pltpu.roll(last_col, shift=1, axis=0)
    col0 = _col_iota(x.shape) == 0
    out = jnp.where(col0, prev_last, rolled)
    first = col0 & (_row_iota(x.shape) == 0)
    return jnp.where(first, first_vals, out)


def _seg_scan_2level(v, K):
    """Inclusive segmented OR-scan over row-major linear order.

    (v, K) combine: x after y = (x | (y_v & ~x_K), x_K | y_K) — v
    accumulates within segments, K kills across boundaries. Returns the
    full-prefix (v, K) per element."""
    s = 1
    while s < COLS:
        v = v | (_roll_right_cols(v, s) & ~K)
        K = K | _roll_right_cols(K, s)
        s *= 2
    # row summaries: the inclusive scan value at each row's last element
    sv = v[:, COLS - 1 : COLS]
    sK = K[:, COLS - 1 : COLS]
    s = 1
    while s < ROWS:
        sv = sv | (_roll_down_rows(sv, s) & ~sK)
        sK = sK | _roll_down_rows(sK, s)
        s *= 2
    # exclusive row prefixes (row r gets rows 0..r-1 combined)
    pv = _roll_down_rows(sv, 1)
    pK = _roll_down_rows(sK, 1)
    return v | (pv & ~K), K | pK


def _swar_counts(v, bits: int):
    """Per-subfield popcounts of v, packed in the same subfield layout."""
    x = v - ((v >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)  # per-byte counts
    if bits == 8:
        return x
    x = x + (x >> 8)
    if bits == 16:
        return x & jnp.uint32(0x001F001F)
    return (x + (x >> 16)) & jnp.uint32(0x3F)


def _rev2comp_vec(words):
    out = []
    for w in reversed(words):
        x = ~w
        x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
        x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
        x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
        x = (x << 16) | (x >> 16)
        out.append(x)
    return tuple(out)


def _key_new_vec(cur, prev, k, KW):
    shift = KW * 32 - 2 * k
    neq = jnp.zeros_like(cur[0], dtype=jnp.bool_)
    for i in range(KW):
        lo_bit = (KW - 1 - i) * 32
        if lo_bit >= shift:
            neq = neq | (cur[i] != prev[i])
        elif lo_bit + 32 > shift:
            s = shift - lo_bit
            neq = neq | ((cur[i] >> s) != (prev[i] >> s))
    return neq


def _pal_vec(cur, rev, k, KW):
    """key's top 2k bits == their own reverse complement (see ksweep.py)."""
    shift = KW * 32 - 2 * k
    eq = jnp.ones_like(cur[0], dtype=jnp.bool_)
    wshift, bshift = divmod(shift, 32)
    for i in range(KW):
        src = i - wshift
        lhs = jnp.zeros_like(cur[0])
        if src >= 0:
            lhs = cur[src] >> bshift
            if bshift > 0 and src - 1 >= 0:
                lhs = lhs | (cur[src - 1] << (32 - bshift))
        lo_bit = (KW - 1 - i) * 32
        if lo_bit >= 2 * k:
            rhs = jnp.zeros_like(rev[i])
        elif lo_bit + 32 <= 2 * k:
            rhs = rev[i]
        else:
            rhs = rev[i] & jnp.uint32((1 << (2 * k - lo_bit)) - 1)
        if lo_bit + 32 > 2 * k:  # mask lhs identically (top bits beyond 2k)
            if lo_bit >= 2 * k:
                lhs = jnp.zeros_like(lhs)
            else:
                lhs = lhs & jnp.uint32((1 << (2 * k - lo_bit)) - 1)
        eq = eq & (lhs == rhs)
    return eq


SUM_BITS = 16          # sum-channel subfield width (2 ks per word)
SUM_SAT = 1023         # saturation; valid for caps <= (SUM_SAT - 1) // 2


def _satadd16(a, b):
    """Per-16-bit-field saturating add (fields <= SUM_SAT, so the raw sum
    never carries across fields)."""
    s = a + b
    lo = s & jnp.uint32(0xFFFF)
    hi = s >> 16
    # Mosaic has no unsigned min (arith.minui): select instead
    lo = jnp.where(lo > jnp.uint32(SUM_SAT), jnp.uint32(SUM_SAT), lo)
    hi = jnp.where(hi > jnp.uint32(SUM_SAT), jnp.uint32(SUM_SAT), hi)
    return (hi << 16) | lo


def _seg_sum_2level(v, K):
    """Segmented saturating-SUM scan, same structure as _seg_scan_2level
    (kill fields K are 16-bit all-ones where a segment restarts)."""
    s = 1
    while s < COLS:
        v = _satadd16(v, _roll_right_cols(v, s) & ~K)
        K = K | _roll_right_cols(K, s)
        s *= 2
    sv = v[:, COLS - 1 : COLS]
    sK = K[:, COLS - 1 : COLS]
    s = 1
    while s < ROWS:
        sv = _satadd16(sv, _roll_down_rows(sv, s) & ~sK)
        sK = sK | _roll_down_rows(sK, s)
        s *= 2
    pv = _roll_down_rows(sv, 1)
    pK = _roll_down_rows(sK, 1)
    return _satadd16(v, pv & ~K), K | pK


def _popcount32(x):
    """Full-word popcount (Mosaic-safe SWAR)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    x = x + (x >> 8)
    return (x + (x >> 16)) & jnp.uint32(0x3F)


def _mode_stats(sub, mode, G, cs, mp):
    """[(output bin index, hit mask)] for one k's per-element run masks.

    sub: the k's accumulated member-presence bitmask (uint32 array of any
    shape).  Modes mirror engine/ksweep_classify.py's XLA scans:

    - "occ": exp1 — bins 1..G by distinct-member popcount (cap cs)
    - "pivot_rest": exp2 within — member 0 = pivot; bins by popcount of
      the rest bits, pivot-present classes only (mp = n_rest)
    - "multi_pivot": exp2 across — mp = D; pivots bits 0..D-1, group
      sets D..2D-1; bin (num, j) = pivot num present with j OTHER groups
    - "containment": exp3 — mp = (nq, ng); bin (q, 0) = query q present,
      (q, 1+g) = query q AND group g present
    - "buckets": exp4 — mp = D; member 0 = pivot, groups 1..D; bin
      (d, m-1) = pivot-present class in group d with |matches| = m, bin
      D*D = matched-nothing.  The kernel weights hits by the class's
      saturated pivot multiplicity (the segmented SUM channel).
    """
    ipc = _popcount32(sub).astype(jnp.int32)
    if mode == "occ":
        b = jnp.minimum(ipc, cs)
        return [(bb - 1, b == bb) for bb in range(1, G + 1)]
    if mode == "pivot_rest":
        nr = mp
        selp = (sub & 1) == 1
        occ = _popcount32(sub >> 1).astype(jnp.int32)
        return [(j, selp & (occ == j)) for j in range(nr + 1)]
    if mode == "multi_pivot":
        D = mp
        out = []
        for num in range(D):
            sel = ((sub >> num) & 1) == 1
            others = jnp.uint32((((1 << D) - 1) & ~(1 << num)) << D)
            occ = _popcount32(sub & others).astype(jnp.int32)
            out.extend((num * D + j, sel & (occ == j)) for j in range(D))
        return out
    if mode == "containment":
        nq, ng = mp
        out = []
        for q in range(nq):
            sq = ((sub >> q) & 1) == 1
            out.append((q * (ng + 1), sq))
            out.extend(
                (q * (ng + 1) + 1 + g, sq & (((sub >> (nq + g)) & 1) == 1))
                for g in range(ng)
            )
        return out
    if mode == "buckets":
        D = mp[0]
        selp = (sub & 1) == 1
        gbits = (sub >> 1) & jnp.uint32((1 << D) - 1)
        nmatch = _popcount32(gbits).astype(jnp.int32)
        out = []
        for d in range(D):
            in_d = ((gbits >> d) & 1) == 1
            out.extend(
                (d * D + (m - 1), selp & in_d & (nmatch == m))
                for m in range(1, D + 1)
            )
        out.append((D * D, selp & (nmatch == 0)))
        return out
    raise ValueError(f"unknown scan mode {mode!r}")


def mode_out_bins(mode: str, G: int, mp) -> int:
    if mode == "occ":
        return G
    if mode == "pivot_rest":
        return mp + 1
    if mode == "multi_pivot":
        return mp * mp
    if mode == "containment":
        return mp[0] * (mp[1] + 1)
    if mode == "buckets":
        return mp[0] * mp[0] + 1
    raise ValueError(f"unknown scan mode {mode!r}")


def _kernel(*refs, ks, kmax, KW, G, cs, bits, packed, mode="occ", mp=None):
    # refs: key words [KW], payload (absent when packed), out
    #        (2*n_ks, BINS_PAD) [hist_d rows, then hist_pal rows], carry
    #        SMEM [KW + n_channels + 1 (+ sum channels for "buckets")],
    #        cum VMEM (2*n_ks, BINS_PAD)
    n_ks = len(ks)
    per_word = 32 // bits
    n_ch = -(-n_ks // per_word)
    n_sum_ch = -(-n_ks // 2) if mode == "buckets" else 0
    keys_ref = refs[:KW]
    off = KW if packed else KW + 1
    out_ref = refs[off]
    carry = refs[off + 1]  # [0:KW] prev key, [KW:KW+n_ch] or, [KW+n_ch] pal bits
    cum = refs[off + 2]
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)
    subfield_max = jnp.uint32((1 << bits) - 1)

    @pl.when(i == 0)
    def _():
        for wi in range(KW):
            carry[wi] = jnp.uint32(0xFFFFFFFF)
        for c in range(n_ch):
            carry[KW + c] = jnp.uint32(0)
        carry[KW + n_ch] = jnp.uint32(0)
        for sc in range(n_sum_ch):
            carry[KW + n_ch + 1 + sc] = jnp.uint32(0)
        cum[:] = jnp.zeros((2 * n_ks, BINS_PAD), jnp.int32)

    cur = [keys_ref[wi][:] for wi in range(KW)]  # (ROWS, COLS)
    if packed:
        # payload rides the last key word's spare low bits (engine/ksweep
        # PACK_GID_BITS/PACK_NIO_BITS layout: gid << PACK_NIO_BITS | nio)
        gid = (cur[KW - 1] >> PACK_NIO_BITS) & jnp.uint32((1 << PACK_GID_BITS) - 1)
        nio = cur[KW - 1] & jnp.uint32((1 << PACK_NIO_BITS) - 1)
    else:
        pay = refs[KW][:]
        gid = (pay >> 8) & jnp.uint32(0xFF)
        nio = pay & jnp.uint32(0xFF)

    prev = [
        _shift_lin1(cur[wi], jnp.full_like(cur[wi], carry[wi])) for wi in range(KW)
    ]

    key_new = [_key_new_vec(cur, prev, k, KW) for k in ks]
    rev = _rev2comp_vec(cur)
    pal = {k: _pal_vec(cur, rev, k, KW) for k in ks if k % 2 == 0}

    # "buckets" weights: the pivot's (member 0) saturated multiplicity per
    # run, from a segmented saturating-SUM scan (two 16-bit ks per word)
    w_of, w_last = {}, {}
    if mode == "buckets":
        sum_base = KW + n_ch + 1
        for sc in range(n_sum_ch):
            sks = list(enumerate(ks))[2 * sc : 2 * sc + 2]
            vsum = jnp.zeros_like(cur[0])
            Ksum = jnp.zeros_like(cur[0])
            for s, (ka, k) in enumerate(sks):
                vsum = vsum | jnp.where(
                    (nio >= k) & (gid == 0),
                    jnp.uint32(1) << (SUM_BITS * s), jnp.uint32(0),
                )
                Ksum = Ksum | jnp.where(
                    key_new[ka], jnp.uint32(0xFFFF) << (SUM_BITS * s),
                    jnp.uint32(0),
                )
            vsum, Ksum = _seg_sum_2level(vsum, Ksum)
            vsum = _satadd16(
                vsum, jnp.full_like(vsum, carry[sum_base + sc]) & ~Ksum
            )
            pvs = _shift_lin1(vsum, jnp.full_like(vsum, carry[sum_base + sc]))
            v_last_sc = vsum[ROWS - 1, COLS - 1]
            for s, (ka, k) in enumerate(sks):
                w_of[ka] = (pvs >> (SUM_BITS * s)) & jnp.uint32(0xFFFF)
                w_last[ka] = (v_last_sc >> (SUM_BITS * s)) & jnp.uint32(0xFFFF)
            carry[sum_base + sc] = v_last_sc

    base = jnp.uint32(1) << gid  # one-hot gid, fits in the low `bits` bits
    for c in range(n_ch):
        cks = ks[c * per_word : (c + 1) * per_word]
        v = jnp.zeros_like(cur[0])
        K = jnp.zeros_like(cur[0])
        for s, k in enumerate(cks):
            v = v | jnp.where(nio >= k, base << (s * bits), jnp.uint32(0))
            K = K | jnp.where(
                key_new[c * per_word + s], subfield_max << (s * bits), jnp.uint32(0)
            )
        v, K = _seg_scan_2level(v, K)
        # inject the carried OR into the first (still-open) segment
        v = v | (~K & jnp.full_like(v, carry[KW + c]))
        # previous element's accumulated OR (first element <- carried OR)
        pv = _shift_lin1(v, jnp.full_like(v, carry[KW + c]))

        for s, k in enumerate(cks):
            ki = c * per_word + s
            sub = (pv >> (s * bits)) & subfield_max
            closing = key_new[ki]
            if k % 2 == 0:
                pal_prev_u = _shift_lin1(
                    pal[k].astype(jnp.uint32),
                    (jnp.full_like(v, carry[KW + n_ch]) >> ki) & 1,
                )
                pal_prev = pal_prev_u > 0
            bin_lane = jax.lax.broadcasted_iota(jnp.int32, (1, BINS_PAD), 1)
            upd_d = jnp.zeros((1, BINS_PAD), jnp.int32)
            upd_p = jnp.zeros((1, BINS_PAD), jnp.int32)
            if mode == "buckets":
                # per-run pivot multiplicity, palindromic runs halved
                # BEFORE the saturation cap (they hold both strands)
                cw = w_of[ki]
                if k % 2 == 0:
                    cw = jnp.where(pal_prev, cw >> 1, cw)
                cw = jnp.where(
                    cw > jnp.uint32(mp[1]), jnp.uint32(mp[1]), cw
                ).astype(jnp.int32)
            else:
                cw = None
            for idx, m in _mode_stats(sub, mode, G, cs, mp):
                hit = closing & m
                if cw is None:
                    cnt = jnp.sum(hit.astype(jnp.int32))
                else:
                    cnt = jnp.sum(jnp.where(hit, cw, 0))
                upd_d = upd_d + jnp.where(bin_lane == idx, cnt, 0)
                if k % 2 == 0:
                    if cw is None:
                        cnt_p = jnp.sum((hit & pal_prev).astype(jnp.int32))
                    else:
                        cnt_p = jnp.sum(jnp.where(hit & pal_prev, cw, 0))
                    upd_p = upd_p + jnp.where(bin_lane == idx, cnt_p, 0)
            cum[ki : ki + 1, :] = cum[ki : ki + 1, :] + upd_d
            if k % 2 == 0:
                cum[n_ks + ki : n_ks + ki + 1, :] = (
                    cum[n_ks + ki : n_ks + ki + 1, :] + upd_p
                )

        # close the final open run of this channel's ks on the last tile
        @pl.when(i == n_prog - 1)
        def _(c=c, v=v, cks=cks):
            v_last = v[ROWS - 1, COLS - 1]
            for s, k in enumerate(cks):
                ki = c * per_word + s
                sub_last = (v_last >> (s * bits)) & subfield_max
                bin_lane = jax.lax.broadcasted_iota(jnp.int32, (1, BINS_PAD), 1)
                add = jnp.zeros((1, BINS_PAD), jnp.int32)
                if mode == "buckets":
                    cwl = w_last[ki]
                    if k % 2 == 0:
                        # bool arrays can't scalar-extract in Mosaic
                        pal_l = pal[k].astype(jnp.uint32)[ROWS - 1, COLS - 1]
                        cwl = jnp.where(pal_l > 0, cwl >> 1, cwl)
                    cwl = jnp.where(
                        cwl > jnp.uint32(mp[1]), jnp.uint32(mp[1]), cwl
                    ).astype(jnp.int32)
                    unit = cwl
                else:
                    unit = 1
                for idx, m in _mode_stats(sub_last, mode, G, cs, mp):
                    add = add + jnp.where(
                        (bin_lane == idx) & m, unit, 0
                    ).astype(jnp.int32)
                cum[ki : ki + 1, :] = cum[ki : ki + 1, :] + add
                if k % 2 == 0:
                    pal_last = pal[k].astype(jnp.int32)[ROWS - 1, COLS - 1]
                    cum[n_ks + ki : n_ks + ki + 1, :] = cum[
                        n_ks + ki : n_ks + ki + 1, :
                    ] + jnp.where(pal_last > 0, add, jnp.zeros_like(add))

        carry[KW + c] = v[ROWS - 1, COLS - 1]

    # carried pal bits for every k (evaluated on the tile's last element)
    pal_bits = jnp.uint32(0)
    for ki, k in enumerate(ks):
        if k % 2 == 0:
            pal_bits = pal_bits | (
                pal[k].astype(jnp.uint32)[ROWS - 1, COLS - 1] << ki
            )
    carry[KW + n_ch] = pal_bits
    for wi in range(KW):
        carry[wi] = cur[wi][ROWS - 1, COLS - 1]

    @pl.when(i == n_prog - 1)
    def _():
        out_ref[:] = cum[:]


def _mask_bits(G: int) -> int:
    return 8 if G <= 8 else 16 if G <= 16 else 32


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10))
def _scan_chunk(skeys, spay, ks, kmax, KW, G, cs, interpret=False, packed=False,
                mode="occ", mp=None):
    n = skeys[0].shape[0]
    assert n % TILE == 0, f"length {n} not a multiple of {TILE}"
    n_ks = len(ks)
    bits = _mask_bits(G)
    n_ch = -(-n_ks // (32 // bits))
    ins = [w.reshape(n // COLS, COLS) for w in skeys]
    if not packed:
        ins.append(spay.reshape(n // COLS, COLS))
    in_specs = [
        pl.BlockSpec((ROWS, COLS), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(len(ins))
    ]
    out = pl.pallas_call(
        functools.partial(
            _kernel, ks=ks, kmax=kmax, KW=KW, G=G, cs=cs, bits=bits,
            packed=packed, mode=mode, mp=mp,
        ),
        grid=(n // TILE,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (2 * n_ks, BINS_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * n_ks, BINS_PAD), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM(
                (KW + n_ch + 1 + (-(-n_ks // 2) if mode == "buckets" else 0),),
                jnp.uint32,
            ),
            pltpu.VMEM((2 * n_ks, BINS_PAD), jnp.int32),
        ],
        interpret=interpret,
    )(*ins)
    return out.reshape(2, n_ks, BINS_PAD)


def scan_multi_k_pallas(
    skeys, spay, ks, kmax, KW, n_members, cs, interpret=False, packed=False,
    raw=False, mode="occ", mode_params=None,
):
    """Per-k statistics (len(ks), out_bins) from the shared sort.

    mode="occ" (default): canonical occurrence histograms over n_members
    bins; the classification modes (see _mode_stats) read exp2/3/4's
    quantities out of the same scan — n_members stays the MASK width
    (total packed members), out bins come from mode_out_bins.

    ks are processed in chunks of MAX_KS_PER_CALL (bounding VMEM and compile
    size); the sorted arrays are re-read per chunk (cheap, bandwidth-bound).
    packed=True reads gid/nio from the last key word's spare bits (spay
    unused, may be None).  raw=True returns the (2, n_ks, out_bins)
    (doubled, palindromic) pair WITHOUT the (d+p)//2 canonical combine —
    for consumers that sum partial histograms over key ranges first (the
    sharded and streaming sweeps), where a class's two strand runs can
    land in different shards/groups.
    """
    nb = mode_out_bins(mode, n_members, mode_params)
    assert nb <= BINS_PAD, f"{mode} needs {nb} bins > {BINS_PAD}"
    chunks = [
        tuple(ks[i : i + MAX_KS_PER_CALL])
        for i in range(0, len(ks), MAX_KS_PER_CALL)
    ]
    outs = [
        _scan_chunk(skeys, spay, chunk, kmax, KW, n_members, cs, interpret,
                    packed, mode, mode_params)
        for chunk in chunks
    ]
    dp = jnp.concatenate(outs, axis=1)  # (2, n_ks, BINS_PAD)
    if raw:
        return dp[:, :, :nb]
    return (dp[0, :, :nb] + dp[1, :, :nb]) // 2
