"""MEM stack: native MS engine vs brute force, extraction, exp5/7/8."""

import math

import numpy as np
import pytest

from conftest import random_dna
from khoice_tpu.mems.extract import extract_half_mems, extract_mems
from khoice_tpu.mems.ms import MatchingStatisticsIndex, _build_lib
from khoice_tpu.pipelines.exp5 import run_exp5
from khoice_tpu.pipelines.exp7 import run_exp7
from khoice_tpu.pipelines.exp8 import run_exp8
from khoice_tpu.pipelines.mem_common import combined_text


def brute_ms(text, query):
    out = []
    for i in range(len(query)):
        best = 0
        for l in range(len(query) - i, 0, -1):
            if query[i : i + l] in text:
                best = l
                break
        out.append(best)
    return out


def test_native_lib_builds():
    assert _build_lib() is not None, "native MS engine failed to compile"


def test_matching_statistics_vs_brute(rng):
    text = random_dna(rng, 500)
    idx = MatchingStatisticsIndex(text)
    for _ in range(5):
        q = random_dna(rng, 40)
        # embed a guaranteed match
        q = q[:10] + text[100:120] + q[30:]
        assert idx.matching_statistics(q).tolist() == brute_ms(text, q)


def test_locate(rng):
    text = random_dna(rng, 300)
    idx = MatchingStatisticsIndex(text)
    pos = idx.locate(text[50:80])
    assert pos >= 0 and text[pos : pos + 30] == text[50:80]
    assert idx.locate("N" * 10) == -1


def test_extract_mems_semantics():
    seq = "ACGTACGTACGT"
    ms = np.array([5, 4, 3, 6, 5, 4, 3, 2, 1, 1, 1, 1])
    mems = extract_mems([seq], [ms], threshold=3)
    # peaks: pos0 (5), pos3 (6>=3 and >= prev 3), pos9/10/11 (1<3 no)...
    names = [f.name for f in mems]
    assert names[0] == "read_0_mem_0_length_5"
    assert any("length_6" in n for n in names)
    halfs = extract_half_mems([seq], [ms], threshold=4)
    assert len(halfs) == sum(1 for x in ms if x >= 4)
    assert halfs[0].seq == seq[0:5]


def test_feature_cap_1000():
    seq = "A" * 1200
    ms = np.full(1200, 1100)
    ms[0] = 1100
    feats = extract_half_mems([seq], [ms], threshold=5)
    assert feats[0].length == 1100
    assert len(feats[0].seq) == 1000
    assert "length_1100" in feats[0].name


def make_mem_world(rng, d=2):
    datasets = {}
    pivots = {}
    for num in range(1, d + 1):
        marker = random_dna(rng, 150)
        genomes = [[marker + random_dna(rng, 150)] for _ in range(2)]
        datasets[num] = genomes
        pivots[num] = [marker + random_dna(rng, 100)]
    return pivots, datasets


def test_exp5_end_to_end(rng, tmp_path):
    pivots, datasets = make_mem_world(rng)
    out = run_exp5(pivots, datasets, str(tmp_path), threshold=10)
    cm_path = out["mems"]["confusion_matrix"]
    rows = [line.split(",") for line in open(cm_path).read().strip().split("\n")]
    assert len(rows) == 2 and len(rows[0]) == 2
    # pivot 1 shares its marker with dataset 1 -> diagonal should dominate
    cm = np.array([[float(x) for x in r] for r in rows])
    assert cm[0, 0] > cm[0, 1]
    assert cm[1, 1] > cm[1, 0]


def test_exp7_read_level(rng, tmp_path):
    pivots, datasets = make_mem_world(rng)
    reads = {
        num: [pivots[num][0][i : i + 60] for i in range(0, 120, 20)]
        for num in pivots
    }
    out = run_exp7(reads, datasets, str(tmp_path), threshold=10)
    cm_path = out["mems"]["confusion_matrix"]
    rows = [line.split(",") for line in open(cm_path).read().strip().split("\n")]
    cm = np.array([[float(x) for x in r] for r in rows])
    # read counts conserved per pivot row
    assert cm.sum(axis=1).tolist() == [len(reads[1]), len(reads[2])]


def test_exp8_threshold_sweep(rng, tmp_path):
    pivots, datasets = make_mem_world(rng)
    reads = {num: [pivots[num][0][:80]] for num in pivots}
    out = run_exp8(reads, datasets, str(tmp_path), t_values=[1, 20])
    assert set(out["mems"].keys()) == {1, 20}
    for t in (1, 20):
        assert "t_" + str(t) in out["mems"][t]["confusion_matrix"]


def test_batch_matching_statistics_vs_brute(rng):
    """Batch MS (generalized SA + LCP sweeps) must equal both brute force
    and the per-read query path — including reads with zero matches, exact
    full-text reads, and repeat-heavy text."""
    text = random_dna(rng, 400) + "ACGT" * 50 + random_dna(rng, 200)
    idx = MatchingStatisticsIndex(text)
    reads = [
        random_dna(rng, 35),
        text[50:120],                      # exact substring
        "ACGT" * 12,                       # repeat family
        random_dna(rng, 10) + text[500:540] + random_dna(rng, 10),
        "N" * 20,                          # symbols absent from text
    ]
    got = idx.batch_matching_statistics(reads)
    assert len(got) == len(reads)
    for q, ms in zip(reads, got):
        assert ms.tolist() == brute_ms(text, q), q[:20]
        assert ms.tolist() == idx.matching_statistics(q).tolist()


def test_batch_matching_statistics_no_cross_read_leak(rng):
    """A pattern shared by two READS but absent from the text must not
    inflate MS (the unique-separator property of the batch SA)."""
    text = random_dna(rng, 300)
    shared = "TTTTGGGGCCCCAAAATTTT"
    assert shared not in text
    reads = [shared + random_dna(rng, 20), random_dna(rng, 20) + shared]
    idx = MatchingStatisticsIndex(text)
    got = idx.batch_matching_statistics(reads)
    for q, ms in zip(reads, got):
        assert ms.tolist() == brute_ms(text, q)


def test_exp7_read_type_axis(rng, tmp_path):
    """Reference layout: four trial CSVs per trial (mem_type x read_type,
    exp_type_7.smk:284-292) with per-read_type output trees, and an
    oracle-checked ont confusion matrix (reads built to match one dataset
    unambiguously, so the vote outcome is exact)."""
    pivots, datasets = make_mem_world(rng)
    # ont reads: substrings of each dataset's marker -> every read's MEMs
    # locate only in its own dataset (no ties, no rng sensitivity)
    reads = {
        "illumina": {num: [pivots[num][0][:60]] for num in pivots},
        "ont": {num: [datasets[num][0][0][:120], datasets[num][1][0][:90]]
                for num in pivots},
    }
    out = run_exp7(reads, datasets, str(tmp_path), threshold=10, trial=3)
    for mt in ("mems", "half_mems"):
        for rt in ("illumina", "ont"):
            assert (mt, rt) in out
            final = tmp_path / f"final_output_type_7/trial_3_{mt}_{rt}.csv"
            assert final.exists(), final
            cm = tmp_path / f"output_type_7/{mt}/{rt}/confusion_matrix.csv"
            assert cm.exists(), cm
    # oracle: both ont reads of pivot num match dataset num exclusively
    cm_path = out[("mems", "ont")]["confusion_matrix"]
    rows = [r.split(",") for r in open(cm_path).read().strip().split("\n")]
    cm = np.array([[float(x) for x in r] for r in rows])
    np.testing.assert_array_equal(cm, np.array([[2.0, 0.0], [0.0, 2.0]]))


def test_exp8_read_type_axis(rng, tmp_path):
    """exp8 outputs land at output_type_8/{mem_type}/t_{t}/{read_type}/
    (exp_type_8.smk:247-261) and its own read simulation yields the
    first-N head subset per read type (exp_type_8.smk:110-135)."""
    from khoice_tpu.pipelines.exp8 import simulate_exp8_reads

    pivots, datasets = make_mem_world(rng)
    # ONT reads are 200-1100 bp; give the simulator long enough pivots
    pivots = {num: [p[0] * 8] for num, p in pivots.items()}
    reads = simulate_exp8_reads(pivots, num_reads=3, seed=0)
    assert set(reads) == {"illumina", "ont"}
    for rt in reads:
        for num in pivots:
            assert len(reads[rt][num]) == 3
    out = run_exp8(reads, datasets, str(tmp_path), t_values=[1, 20])
    for mt in ("mems", "half_mems"):
        for rt in ("illumina", "ont"):
            assert set(out[(mt, rt)].keys()) == {1, 20}
            for t in (1, 20):
                p = tmp_path / f"output_type_8/{mt}/t_{t}/{rt}/confusion_matrix.csv"
                assert p.exists(), p
