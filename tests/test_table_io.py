"""Table persistence round-trips (.npz + KMC text dump formats)."""

import jax.numpy as jnp

from conftest import random_dna
from khoice_tpu.engine import count_codes
from khoice_tpu.engine.table_io import (
    load_table,
    read_dump_txt,
    save_table,
    write_dump_txt,
)
from khoice_tpu.io import encode_records


def test_npz_roundtrip(rng, tmp_path):
    t = count_codes(jnp.asarray(encode_records([random_dna(rng, 500)])), 13)
    path = str(tmp_path / "table.npz")
    save_table(path, t)
    t2 = load_table(path)
    assert t2.dump() == t.dump()
    assert t2.k == 13


def test_dump_txt_roundtrip(rng, tmp_path):
    t = count_codes(jnp.asarray(encode_records([random_dna(rng, 400)])), 9)
    path = str(tmp_path / "dump.txt")
    write_dump_txt(path, t)
    lines = open(path).read().strip().split("\n")
    assert all(len(l.split("\t")) == 2 for l in lines)
    kmers = [l.split("\t")[0] for l in lines]
    assert kmers == sorted(kmers)
    t2 = read_dump_txt(path, 9)
    assert t2.dump() == t.dump()
