"""Fused occurrence-scan Pallas kernel vs XLA path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import random_dna
from khoice_tpu import oracle
from khoice_tpu.engine.bits import key_words
from khoice_tpu.engine.extract import extract_canonical
from khoice_tpu.io import encode_records
from khoice_tpu.kernels.occ_scan_pallas import TILE, occ_hist_pallas


def sorted_pairs(members, k):
    """Build the sorted (key, gid) arrays the kernel consumes."""
    w = key_words(k)
    all_keys, all_gids = [], []
    for gid, m in enumerate(members):
        codes = jnp.asarray(encode_records([m]))
        keys, valid = extract_canonical(codes, k)
        gidv = jnp.where(valid, jnp.uint32(gid), jnp.uint32(0xFFFFFFFF))
        all_keys.append(keys)
        all_gids.append(gidv)
    keys = tuple(jnp.concatenate([kk[i] for kk in all_keys]) for i in range(w))
    gids = jnp.concatenate(all_gids)
    n = gids.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    pad = n_pad - n
    keys = tuple(
        jnp.concatenate([kk, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)]) for kk in keys
    )
    gids = jnp.concatenate([gids, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)])
    srt = jax.lax.sort(list(keys) + [gids], num_keys=w + 1, is_stable=False)
    return tuple(srt[:w]), srt[w]


@pytest.mark.parametrize("k", [11, 31])
def test_occ_scan_kernel_matches_oracle(rng, k):
    base = random_dna(rng, 4000)
    members = []
    for i in range(5):
        seq = list(base)
        for _ in range(150 * (i + 1)):
            seq[rng.randrange(len(base))] = "ACGT"[rng.randrange(4)]
        members.append("".join(seq))

    keys, gids = sorted_pairs(members, k)
    hist = np.asarray(
        occ_hist_pallas.__wrapped__(keys, gids, len(members), interpret=True)
    )
    od = oracle.union_sum(
        [oracle.set_counts(oracle.count_kmers([m], k), 1) for m in members], cs=5000
    )
    assert hist.tolist() == oracle.histogram(od, cx=len(members))


def test_occ_scan_kernel_run_spanning_tiles(rng):
    # one key repeated heavily so runs span tile boundaries
    k = 7
    seq = "ACGTGCA" * (TILE // 3)
    members = [seq, seq[: len(seq) // 2]]
    keys, gids = sorted_pairs(members, k)
    assert gids.shape[0] > TILE  # must actually cross a tile boundary
    hist = np.asarray(
        occ_hist_pallas.__wrapped__(keys, gids, len(members), interpret=True)
    )
    od = oracle.union_sum(
        [oracle.set_counts(oracle.count_kmers([m], k), 1) for m in members], cs=5000
    )
    assert hist.tolist() == oracle.histogram(od, cx=len(members))
