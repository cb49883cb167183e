"""Canonical k-mer extraction from encoded sequence codes.

Replaces the counting front-end of KMC3 (`kmc -fm -k{k} -ci1`, reference:
workflow/rules/exp_type_1.smk:163) with a vectorized XLA computation:

- input: uint8 codes, A=0 C=1 G=2 T=3, anything >=4 is invalid (N bases and
  sequence separators — k-mers never span FASTA records, matching KMC).
- a k-mer's key is the 2-bit big-endian packing (see engine/bits.py); its
  *canonical* form is min(forward, reverse-complement), identical to KMC's
  default and to the reference's Python reimplementation
  (reference: src/merge_lists.py:60-73).
- invalid windows get the all-ones SENTINEL key so a single sort pushes them
  past every valid key.

The k-sweep trick (extract_canonical_sweep): the forward key of a j-mer at
position i is a prefix of the K-mer at i, and its reverse complement is a
suffix of the K-mer's reverse complement:

    fwd_j(i) = fwd_K(i) >> 2*(K-j)          rc_j(i) = rc_K(i) mod 4^j

so one O(K * n) extraction pass at K = max(k grid) serves every smaller k by
cheap shifts/masks — the whole 30-point k grid of the reference
(workflow/Snakefile:36) costs one pass where KMC re-reads the input per k.
"""

from __future__ import annotations

import jax.numpy as jnp

from .bits import (
    SENTINEL,
    key_words,
    sentinel_key,
    shl2_or,
    words_lt,
    words_select,
    zeros_key,
)


def _window_valid(codes_padded: jnp.ndarray, n: int, k: int) -> jnp.ndarray:
    """valid[i] = all codes[i:i+k] are real bases (<4)."""
    bad = (codes_padded >= 4).astype(jnp.int32)
    cbad = jnp.cumsum(bad)
    cbad0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), cbad])
    return (cbad0[k : n + k] - cbad0[:n]) == 0


def _fwd_rc_keys(codes_padded: jnp.ndarray, n: int, k: int, n_words: int):
    """Forward and reverse-complement keys for every window start."""
    fwd = zeros_key(n_words, (n,))
    rc = zeros_key(n_words, (n,))
    for j in range(k):
        d = codes_padded[j : j + n].astype(jnp.uint32) & 3
        fwd = shl2_or(fwd, d)
        # rc pushes complemented bases from the window's end to its start
        jr = k - 1 - j
        dr = (codes_padded[jr : jr + n].astype(jnp.uint32) & 3) ^ 3
        rc = shl2_or(rc, dr)
    return fwd, rc


def _canonical(fwd, rc, valid, n_words):
    canon = words_select(words_lt(fwd, rc), fwd, rc)
    sent = sentinel_key(n_words, valid.shape)
    return words_select(valid, canon, sent)


def extract_canonical(codes: jnp.ndarray, k: int):
    """Canonical keys for every window of `codes`.

    Returns (keys: tuple[n_words] of uint32 [n], valid: bool [n]).
    """
    n = codes.shape[0]
    w = key_words(k)
    cp = jnp.concatenate([codes, jnp.full((k,), 4, codes.dtype)])
    valid = _window_valid(cp, n, k)
    fwd, rc = _fwd_rc_keys(cp, n, k, w)
    return _canonical(fwd, rc, valid, w), valid


def extract_canonical_sweep(codes: jnp.ndarray, ks: tuple):
    """Canonical keys for every k in `ks` from ONE O(max(ks)*n) pass.

    Returns {k: (keys tuple, valid)} with per-k word widths.
    """
    ks = tuple(sorted(set(int(k) for k in ks)))
    kmax = ks[-1]
    wmax = key_words(kmax)
    n = codes.shape[0]
    cp = jnp.concatenate([codes, jnp.full((kmax,), 4, codes.dtype)])

    fwd_max = zeros_key(wmax, (n,))
    # rc built incrementally: after step j (processing base at offset j),
    # rc holds rc_{j+1}(i) in its low 2(j+1) bits.
    rc_max = zeros_key(wmax, (n,))

    bad = (cp >= 4).astype(jnp.int32)
    cbad = jnp.cumsum(bad)
    cbad0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), cbad])

    out = {}
    want = set(ks)
    for j in range(kmax):
        d = cp[j : j + n].astype(jnp.uint32) & 3
        fwd_max = shl2_or(fwd_max, d)
        # prepend comp(base_j) at the high end of the current rc_j:
        # rc_{j+1} = rc_j | comp(d) << 2j  (no overlap: rc_j uses low 2j bits)
        dc = d ^ 3
        word_idx = wmax - 1 - (2 * j) // 32
        shift = (2 * j) % 32
        rc_list = list(rc_max)
        rc_list[word_idx] = rc_list[word_idx] | (dc << shift)
        rc_max = tuple(rc_list)

        kk = j + 1
        if kk in want:
            w = key_words(kk)
            valid = (cbad0[kk : n + kk] - cbad0[:n]) == 0
            # fwd_kk currently sits in fwd_max's low 2*kk bits; rc likewise.
            fwd = tuple(fwd_max[wmax - w :])
            rc = tuple(rc_max[wmax - w :])
            # mask to low 2*kk bits within the w-word window
            used_bits = 2 * kk
            masked_f, masked_r = [], []
            for wi in range(w):
                bits_below = 32 * (w - 1 - wi)
                word_bits = max(0, min(32, used_bits - bits_below))
                mask = jnp.uint32(0xFFFFFFFF >> (32 - word_bits)) if word_bits > 0 else jnp.uint32(0)
                masked_f.append(fwd[wi] & mask)
                masked_r.append(rc[wi] & mask)
            out[kk] = (_canonical(tuple(masked_f), tuple(masked_r), valid, w), valid)
    return out
