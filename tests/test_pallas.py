"""Pallas kernels vs XLA reference paths (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from conftest import random_dna
from khoice_tpu.engine.extract import extract_canonical
from khoice_tpu.io import encode_records


@pytest.mark.parametrize("k", [11, 31, 49])
def test_pallas_extract_matches_xla(rng, k, monkeypatch):
    from khoice_tpu.kernels import extract_pallas as ep

    # interpret mode so the kernel runs on the CPU backend
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **kw: orig(*a, interpret=True, **kw)
    )

    seqs = [random_dna(rng, 2000, n_prob=0.01)]
    codes = jnp.asarray(encode_records(seqs))
    keys_ref, valid_ref = extract_canonical(codes, k)
    keys_p, valid_p = ep.extract_canonical_pallas.__wrapped__(codes, k)

    assert np.array_equal(np.asarray(valid_ref), np.asarray(valid_p))
    for a, b in zip(keys_ref, keys_p):
        assert np.array_equal(np.asarray(a), np.asarray(b))
