"""Pallas TPU kernel: canonical k-mer extraction.

Single tiled pass over the code stream: each grid step DMAs its tile plus
a (k-1)-halo from HBM into VMEM, builds forward and reverse-complement
keys with an unrolled 2-bit shift register, takes the canonical min and
masks invalid windows to the SENTINEL — the KMC counting front-end
(reference workflow/rules/exp_type_1.smk:163) as one VMEM-resident kernel.

XLA already fuses the jnp shift chain well (engine/extract.py), so this
kernel is primarily the explicitly-scheduled variant: halo DMA, VMEM
residency and per-tile compute are under kernel control, which is what
lets later fusions (extract+bucket, extract+partition for the sharded
exchange) live in one pass. Selected via KHOICE_PALLAS=1 or
extract_canonical_pallas() directly; bit-identical to the XLA path (see
tests/test_pallas.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.bits import SENTINEL, key_words

LANES = 128
TILE = 8 * 1024          # positions per grid step
HALO = 1024           # >= k-1; Mosaic needs 1024-aligned 1-D DMA slice lengths


def _kernel(codes_hbm, *outs_and_scratch, k: int, n_words: int):
    n_out = n_words + 1  # key words + valid
    outs = outs_and_scratch[:n_out]
    scratch, sem = outs_and_scratch[n_out:]
    i = pl.program_id(0)

    dma = pltpu.make_async_copy(
        codes_hbm.at[pl.ds(i * TILE, TILE + HALO)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    def win(j):
        return scratch[j : j + TILE].reshape(1, TILE).astype(jnp.uint32)

    fwd = [jnp.zeros((1, TILE), jnp.uint32) for _ in range(n_words)]
    rc = [jnp.zeros((1, TILE), jnp.uint32) for _ in range(n_words)]
    valid = jnp.ones((1, TILE), jnp.bool_)

    for j in range(k):
        d = win(j)
        valid = valid & (d < 4)
        db = d & 3
        # fwd = (fwd << 2) | base_j
        for wi in range(n_words - 1):
            fwd[wi] = (fwd[wi] << 2) | (fwd[wi + 1] >> 30)
        fwd[n_words - 1] = (fwd[n_words - 1] << 2) | db
        # rc: push comp(base at offset k-1-j)
        dr = (win(k - 1 - j) & 3) ^ 3
        for wi in range(n_words - 1):
            rc[wi] = (rc[wi] << 2) | (rc[wi + 1] >> 30)
        rc[n_words - 1] = (rc[n_words - 1] << 2) | dr

    # canonical = min(fwd, rc), lexicographic over words
    lt = jnp.zeros((1, TILE), jnp.bool_)
    eq = jnp.ones((1, TILE), jnp.bool_)
    for wi in range(n_words):
        lt = lt | (eq & (fwd[wi] < rc[wi]))
        eq = eq & (fwd[wi] == rc[wi])

    sent = jnp.full((1, TILE), 0xFFFFFFFF, jnp.uint32)
    for wi in range(n_words):
        canon = jnp.where(lt, fwd[wi], rc[wi])
        outs[wi][:] = jnp.where(valid, canon, sent)
    outs[n_words][:] = valid.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1,))
def extract_canonical_pallas(codes: jnp.ndarray, k: int):
    """Drop-in for engine.extract.extract_canonical (same outputs)."""
    n = codes.shape[0]
    w = key_words(k)
    n_pad = ((n + TILE - 1) // TILE) * TILE
    cp = jnp.concatenate(
        [codes, jnp.full((n_pad - n + HALO,), 4, codes.dtype)]
    ).astype(jnp.int32)
    grid = n_pad // TILE

    out_shapes = tuple(
        [jax.ShapeDtypeStruct((1, n_pad), jnp.uint32) for _ in range(w)]
        + [jax.ShapeDtypeStruct((1, n_pad), jnp.int32)]
    )
    out_specs = tuple(
        pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
        for _ in range(w + 1)
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, k=k, n_words=w),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((TILE + HALO,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(cp)
    keys = tuple(o.reshape(-1)[:n] for o in outs[:w])
    valid = outs[w].reshape(-1)[:n] > 0
    return keys, valid


def pallas_enabled() -> bool:
    return os.environ.get("KHOICE_PALLAS", "0") == "1"
