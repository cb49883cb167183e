"""Sharded classification sweeps (dist/ksweep_classify.py): exp2/3/4
pipeline CSVs must be byte-identical with a mesh to the single-device
run, and the raw sweep stats must match across device counts (the
reference fans exp2-4 over cores exactly like exp1,
workflow/rules/exp_type_2.smk:354-380; round-4 VERDICT task 4)."""

import numpy as np
import pytest

from conftest import cpu_devices, random_dna
from khoice_tpu.dist import make_mesh
from test_exp023 import make_world


def _world(rng):
    db = make_world(rng)
    pivots = {num: db[num]["genome_%d_0" % num] for num in db}
    rest = {num: [db[num][f"genome_{num}_{g}"] for g in (1, 2)] for num in db}
    return pivots, rest


@pytest.mark.heavy
def test_exp2_csvs_byte_exact_on_mesh(rng, tmp_path):
    from khoice_tpu.pipelines.exp2 import run_exp2

    pivots, rest = _world(rng)
    ks = [7, 11, 21, 33]
    single = run_exp2(pivots, rest, ks, str(tmp_path / "single"))
    mesh = make_mesh(devices=cpu_devices(8))
    sharded = run_exp2(pivots, rest, ks, str(tmp_path / "mesh"), mesh=mesh)
    for key in ("within", "across"):
        assert open(sharded[key], "rb").read() == open(single[key], "rb").read()


@pytest.mark.heavy
def test_exp3_csv_byte_exact_on_mesh(rng, tmp_path):
    from khoice_tpu.pipelines.exp3 import run_exp3

    pivots, rest = _world(rng)
    reads = {}
    for num in pivots:
        for rt in ("illumina", "ont"):
            reads[(rt, num)] = [pivots[num][0][i : i + 80] for i in range(0, 400, 40)]
    ks = [9, 13, 21]
    single = run_exp3(reads, rest, ks, str(tmp_path / "single"))
    mesh = make_mesh(devices=cpu_devices(8))
    sharded = run_exp3(reads, rest, ks, str(tmp_path / "mesh"), mesh=mesh)
    assert open(sharded, "rb").read() == open(single, "rb").read()


@pytest.mark.heavy
def test_exp4_csv_byte_exact_on_mesh(rng, tmp_path):
    """exp4's buckets mode sums pivot multiplicities (exchange dedupe
    disabled) — repeated pivot k-mers across shard boundaries stress it."""
    from khoice_tpu.pipelines.exp4 import run_exp4

    pivots, rest = _world(rng)
    # amplify pivot multiplicity: duplicate records inside each pivot
    pivots = {num: pivots[num] + pivots[num] for num in pivots}
    ks = [7, 11, 21]
    single = run_exp4(pivots, rest, ks, str(tmp_path / "single"))
    mesh = make_mesh(devices=cpu_devices(8))
    sharded = run_exp4(pivots, rest, ks, str(tmp_path / "mesh"), mesh=mesh)
    assert open(sharded, "rb").read() == open(single, "rb").read()


def test_sharded_classify_device_count_invariance(rng):
    """pivot_rest raw counts identical at 1/2/8 devices (the psum-then-
    halve order must make the result device-count invariant)."""
    from khoice_tpu.dist.ksweep_classify import sharded_pivot_rest_counts_sweep
    from khoice_tpu.engine.ksweep_classify import pivot_rest_counts_sweep
    from khoice_tpu.io import encode_records

    base = random_dna(rng, 900)
    members = []
    for i in range(4):
        seq = list(base)
        for _ in range(40 * (i + 1)):
            seq[rng.randrange(len(base))] = "ACGT"[rng.randrange(4)]
        members.append(encode_records(["".join(seq) + ("A" * 150 if i == 0 else "")]))
    ks = [7, 10, 13, 21]
    want, rem = pivot_rest_counts_sweep(members, ks)
    assert rem == []
    for nd in (1, 2, 8):
        mesh = make_mesh(devices=cpu_devices(nd))
        got, rem2 = sharded_pivot_rest_counts_sweep(mesh, members, ks)
        assert rem2 == []
        for k in ks:
            assert np.array_equal(got[k], want[k]), f"nd={nd} k={k}"
