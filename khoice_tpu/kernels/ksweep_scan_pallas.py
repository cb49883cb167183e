"""Pallas TPU kernel: multi-k occurrence scan over ONE shared-sorted array.

Consumes the doubled-text forward-kmax sort of engine/ksweep.py (key words
MSB-first, left-aligned; payload word gid<<8|nio) and produces, for EVERY k
in a static list at once, the doubled + palindromic occurrence histograms
(hist[b-1] = #runs whose distinct-gid count is b).  engine/ksweep.py
combines them into canonical histograms ((d + pal) / 2), replacing the
reference's per-k kmc+union+histogram chain
(workflow/rules/exp_type_1.smk:156-191) with one pass per ~8 ks.

Per element and per k the work is a segmented OR-scan of one-hot gid
bitmasks with segment resets at k-run boundaries (top-2k-bit changes).  Key
efficiency trick: since masks need only n_members <= 32 bits, SEVERAL ks
share one u32 scan word (8/16/32-bit subfields), so the log2(TILE)-step
Hillis-Steele scan — the expensive part — is paid once per WORD, not per k.
Boundary resets stay per-k because the kill mask K (all-ones per killed
subfield) propagates through the same scan: v |= v_sh & ~K; K |= K_sh.

Run closes are counted at run STARTS (the element where key_new_k fires
charges the PREVIOUS element's scanned OR value), which makes tile
boundaries uniform: the first lane reads the carried OR/pal/key from SMEM.
A final fixup at the last tile closes the still-open run of each k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16 * 1024  # small enough that a chunk's live scan state fits VMEM
BINS_PAD = 128
MAX_KS_PER_CALL = 8


def _roll_right(x, s):
    rolled = pltpu.roll(x, shift=s, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= s, rolled, jnp.zeros_like(x))


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
        eq = eq & (lhs == rhs)
    return eq


def _kernel(*refs, ks, kmax, KW, G, cs, bits, packed):
    # refs: key words [KW], payload (absent when packed), out
    #        (2*n_ks, BINS_PAD) [hist_d rows, then hist_pal rows], carry
    #        SMEM [KW + n_channels + 1], cum VMEM (2*n_ks, BINS_PAD)
    n_ks = len(ks)
    per_word = 32 // bits
    n_ch = -(-n_ks // per_word)
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
        cum[:] = jnp.zeros((2 * n_ks, BINS_PAD), jnp.int32)

    cur = [keys_ref[wi][:] for wi in range(KW)]
    if packed:
        # payload rides the last key word's spare low bits (engine/ksweep
        # PACK_GID_BITS/PACK_NIO_BITS layout: gid << 6 | nio)
        gid = (cur[KW - 1] >> 6) & jnp.uint32(0x1F)
        nio = cur[KW - 1] & jnp.uint32(0x3F)
    else:
        pay = refs[KW][:]
        gid = (pay >> 8) & jnp.uint32(0xFF)
        nio = pay & jnp.uint32(0xFF)

    lane = jax.lax.broadcasted_iota(jnp.int32, cur[0].shape, 1)
    first = lane == 0
    prev = [
        jnp.where(first, jnp.full_like(cur[wi], carry[wi]), _roll_right(cur[wi], 1))
        for wi in range(KW)
    ]

    key_new = [_key_new_vec(cur, prev, k, KW) for k in ks]
    rev = _rev2comp_vec(cur)

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
        # segmented OR scan: v accumulates within segments, K kills across
        s_sh = 1
        while s_sh < TILE:
            v = v | (_roll_right(v, s_sh) & ~K)
            K = K | _roll_right(K, s_sh)
            s_sh *= 2
        # inject the carried OR into the first (still-open) segment
        v = v | (~K & jnp.full_like(v, carry[KW + c]))
        # previous element's accumulated OR (first lane <- carried OR)
        pv = jnp.where(first, jnp.full_like(v, carry[KW + c]), _roll_right(v, 1))
        pc = _swar_counts(pv, bits)

        for s, k in enumerate(cks):
            ki = c * per_word + s
            b = jnp.minimum(
                ((pc >> (s * bits)) & subfield_max).astype(jnp.int32), cs
            )
            closing = key_new[ki]
            if k % 2 == 0:
                pal_prev_u = jnp.where(
                    first,
                    (jnp.full_like(v, carry[KW + n_ch]) >> ki) & 1,
                    _roll_right(_pal_vec(cur, rev, k, KW).astype(jnp.uint32), 1),
                )
                pal_prev = pal_prev_u > 0
            bin_lane = jax.lax.broadcasted_iota(jnp.int32, (1, BINS_PAD), 1)
            upd_d = jnp.zeros((1, BINS_PAD), jnp.int32)
            upd_p = jnp.zeros((1, BINS_PAD), jnp.int32)
            for bb in range(1, G + 1):
                hit = closing & (b == bb)
                cnt = jnp.sum(hit.astype(jnp.int32))
                upd_d = upd_d + jnp.where(bin_lane == bb - 1, cnt, 0)
                if k % 2 == 0:
                    cnt_p = jnp.sum((hit & pal_prev).astype(jnp.int32))
                    upd_p = upd_p + jnp.where(bin_lane == bb - 1, cnt_p, 0)
            cum[ki : ki + 1, :] = cum[ki : ki + 1, :] + upd_d
            if k % 2 == 0:
                cum[n_ks + ki : n_ks + ki + 1, :] = (
                    cum[n_ks + ki : n_ks + ki + 1, :] + upd_p
                )

        # close the final open run of this channel's ks on the last tile
        @pl.when(i == n_prog - 1)
        def _(c=c, v=v, cks=cks):
            last = TILE - 1
            pc_last = _swar_counts(v, bits)[0, last]
            for s, k in enumerate(cks):
                ki = c * per_word + s
                b = jnp.minimum(
                    ((pc_last >> (s * bits)) & subfield_max).astype(jnp.int32), cs
                )
                bin_lane = jax.lax.broadcasted_iota(jnp.int32, (1, BINS_PAD), 1)
                add = jnp.where(
                    (bin_lane == b - 1) & (b >= 1), 1, 0
                ).astype(jnp.int32)
                cum[ki : ki + 1, :] = cum[ki : ki + 1, :] + add
                if k % 2 == 0:
                    pal_last = _pal_vec(cur, rev, k, KW).astype(jnp.int32)[0, last]
                    cum[n_ks + ki : n_ks + ki + 1, :] = cum[
                        n_ks + ki : n_ks + ki + 1, :
                    ] + jnp.where(pal_last > 0, add, jnp.zeros_like(add))

        carry[KW + c] = v[0, TILE - 1]

    # carried pal bits for every k (evaluated on the tile's last element)
    pal_bits = jnp.uint32(0)
    for ki, k in enumerate(ks):
        if k % 2 == 0:
            pal_bits = pal_bits | (
                _pal_vec(cur, rev, k, KW).astype(jnp.uint32)[0, TILE - 1] << ki
            )
    carry[KW + n_ch] = pal_bits
    for wi in range(KW):
        carry[wi] = cur[wi][0, TILE - 1]

    @pl.when(i == n_prog - 1)
    def _():
        out_ref[:] = cum[:]


def _mask_bits(G: int) -> int:
    return 8 if G <= 8 else 16 if G <= 16 else 32


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def _scan_chunk(skeys, spay, ks, kmax, KW, G, cs, interpret=False, packed=False):
    n = skeys[0].shape[0]
    assert n % TILE == 0, f"length {n} not a multiple of {TILE}"
    n_ks = len(ks)
    bits = _mask_bits(G)
    n_ch = -(-n_ks // (32 // bits))
    ins = [w.reshape(1, n) for w in skeys]
    if not packed:
        ins.append(spay.reshape(1, n))
    in_specs = [
        pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
        for _ in range(len(ins))
    ]
    out = pl.pallas_call(
        functools.partial(
            _kernel, ks=ks, kmax=kmax, KW=KW, G=G, cs=cs, bits=bits, packed=packed
        ),
        grid=(n // TILE,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (2 * n_ks, BINS_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * n_ks, BINS_PAD), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((KW + n_ch + 1,), jnp.uint32),
            pltpu.VMEM((2 * n_ks, BINS_PAD), jnp.int32),
        ],
        interpret=interpret,
    )(*ins)
    return out.reshape(2, n_ks, BINS_PAD)


def scan_multi_k_pallas(
    skeys, spay, ks, kmax, KW, n_members, cs, interpret=False, packed=False
):
    """Canonical histograms (len(ks), n_members) from the shared sort.

    ks are processed in chunks of MAX_KS_PER_CALL (bounding VMEM and compile
    size); the sorted arrays are re-read per chunk (cheap, bandwidth-bound).
    packed=True reads gid/nio from the last key word's spare bits (spay
    unused, may be None).
    """
    chunks = [
        tuple(ks[i : i + MAX_KS_PER_CALL])
        for i in range(0, len(ks), MAX_KS_PER_CALL)
    ]
    outs = [
        _scan_chunk(skeys, spay, chunk, kmax, KW, n_members, cs, interpret, packed)
        for chunk in chunks
    ]
    dp = jnp.concatenate(outs, axis=1)  # (2, n_ks, BINS_PAD)
    return (dp[0, :, :n_members] + dp[1, :, :n_members]) // 2
