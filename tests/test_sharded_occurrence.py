"""Sharded fused occurrence histogram vs single-device path and oracle."""

import numpy as np
import pytest

from conftest import cpu_devices, random_dna
from khoice_tpu import oracle
from khoice_tpu.dist import make_mesh, sharded_occurrence_histogram
from khoice_tpu.engine.occurrence import occurrence_histogram
from khoice_tpu.io import encode_records
from khoice_tpu.pipelines.exp1 import run_exp1


def make_members(rng, g=4, glen=600):
    base = random_dna(rng, glen)
    out = []
    for i in range(g):
        seq = list(base)
        for _ in range(40 * (i + 1)):
            seq[rng.randrange(glen)] = "ACGT"[rng.randrange(4)]
        out.append("".join(seq))
    return out


@pytest.mark.parametrize("k", [11, 31])
def test_sharded_occurrence_matches_single(rng, k):
    members = make_members(rng)
    codes = [encode_records([m]) for m in members]
    single = occurrence_histogram(codes, k, cs=5000, cx=64)
    for nd in (2, 8):
        mesh = make_mesh(devices=cpu_devices(nd))
        sh = sharded_occurrence_histogram(mesh, codes, k, cs=5000, cx=64)
        assert sh == single, f"nd={nd}"
    # and against the oracle
    od = oracle.union_sum(
        [oracle.set_counts(oracle.count_kmers([m], k), 1) for m in members], cs=5000
    )
    assert single == oracle.histogram(od, cx=64)


def test_exp1_sharded_csvs_match(rng, tmp_path):
    groups = {
        1: [[m] for m in make_members(rng, g=2)],
        2: [[m] for m in make_members(rng, g=3)],
    }
    ks = [7, 11]
    out_single = run_exp1(groups, ks, str(tmp_path / "single"))
    mesh = make_mesh(devices=cpu_devices(8))
    out_sharded = run_exp1(groups, ks, str(tmp_path / "sharded"), mesh=mesh)
    for key in ("step_5", "step_9"):
        assert open(out_single[key], "rb").read() == open(out_sharded[key], "rb").read()
