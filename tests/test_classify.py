"""Classification (merge_lists semantics) vs dict-based oracle."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import random_dna
from khoice_tpu import oracle
from khoice_tpu.classify import (
    build_annotation,
    feature_buckets,
    read_votes,
)
from khoice_tpu.classify.annotate import vote_lcm
from khoice_tpu.engine import count_codes, set_counts, union_many
from khoice_tpu.io import encode_records
from khoice_tpu.pipelines.exp4 import run_exp4
from khoice_tpu.pipelines.exp6 import run_exp6, reads_matrix


def make_world(rng, d=3, genomes_per=2, glen=300):
    """Returns (pivots {num: [seq]}, rest {num: [[seq],...]})."""
    base = random_dna(rng, glen)
    rest, pivots = {}, {}
    for num in range(1, d + 1):
        genomes = []
        for g in range(genomes_per):
            seq = list(base)
            for _ in range(20 * num + g):
                seq[rng.randrange(glen)] = "ACGT"[rng.randrange(4)]
            genomes.append(["".join(seq)])
        rest[num] = genomes
        pseq = list(base)
        for _ in range(15 * num):
            pseq[rng.randrange(glen)] = "ACGT"[rng.randrange(4)]
        pivots[num] = ["".join(pseq)]
    return pivots, rest


def oracle_group_sets(rest, k):
    return {
        num: oracle.set_counts(
            oracle.union_sum(
                [oracle.set_counts(oracle.count_kmers(g, k), 1) for g in rest[num]],
                cs=5000,
            ),
            1,
        )
        for num in rest
    }


def oracle_buckets(pivot_counts, group_sets, nums):
    d = len(nums)
    buckets = np.zeros((d, d), np.int64)
    unique = 0
    for km, cnt in pivot_counts.items():
        matches = [i for i, num in enumerate(nums) if km in group_sets[num]]
        if not matches:
            unique += cnt
        else:
            for m in matches:
                buckets[m, len(matches) - 1] += cnt
    return buckets, unique


@pytest.mark.parametrize("k", [9, 17])
def test_feature_buckets_match_oracle(rng, k):
    pivots, rest = make_world(rng)
    nums = sorted(rest)
    gs = {
        num: set_counts(
            union_many(
                [set_counts(count_codes(jnp.asarray(encode_records(g)), k), 1) for g in rest[num]],
                cs=5000,
            ),
            1,
        )
        for num in nums
    }
    ogs = oracle_group_sets(rest, k)
    for num in nums:
        pt = count_codes(jnp.asarray(encode_records(pivots[num])), k)
        ann = build_annotation(pt, [gs[j] for j in nums])
        buckets, unique = feature_buckets(ann)
        opc = oracle.count_kmers(pivots[num], k)
        ob, ou = oracle_buckets(opc, ogs, nums)
        assert np.array_equal(buckets, ob), f"pivot {num}"
        assert unique == ou


def test_read_votes_match_oracle(rng):
    k = 11
    pivots, rest = make_world(rng)
    nums = sorted(rest)
    num = 1
    reads = [random_dna(rng, 60) for _ in range(10)]
    # reads drawn from the pivot so k-mers overlap the sets
    reads += [pivots[num][0][i : i + 60] for i in range(0, 200, 40)]

    gs = {
        j: set_counts(
            union_many(
                [set_counts(count_codes(jnp.asarray(encode_records(g)), k), 1) for g in rest[j]],
                cs=5000,
            ),
            1,
        )
        for j in nums
    }
    pt = count_codes(jnp.asarray(encode_records(reads)), k)
    ann = build_annotation(pt, [gs[j] for j in nums])
    votes, unmatched, nk = read_votes(ann, reads_matrix(reads))

    ogs = oracle_group_sets(rest, k)
    lcm = vote_lcm(len(nums))
    for r, read in enumerate(reads):
        ov = np.zeros(len(nums), np.int64)
        ou = 0
        for i in range(len(read) - k + 1):
            km = oracle.canonical(read[i : i + k])
            matches = [j for j, nn in enumerate(nums) if km in ogs[nn]]
            if matches:
                for m in matches:
                    ov[m] += lcm // len(matches)
            else:
                ou += 1
        assert np.array_equal(votes[r], ov), f"read {r}"
        assert unmatched[r] == ou
        assert nk[r] == len(read) - k + 1


def oracle_exp6_trial_csv(pivot_reads, rest, ks, out_path, seed=0, trial=1):
    """Independent dict-based build of the exp6 trial accuracy CSV —
    identical voting (LCM integers), identical seeded tie-break stream,
    identical glob-lexicographic k concatenation order."""
    nums = sorted(rest)
    d = len(nums)
    lcm = vote_lcm(d)
    per_k_lines = {}
    for k in ks:
        ogs = oracle_group_sets(rest, k)
        cm = []
        for num in nums:
            votes_rows = []
            for read in pivot_reads[num]:
                v = np.zeros(d, np.int64)
                for i in range(len(read) - k + 1):
                    window = read[i : i + k]
                    if not set(window) <= set("ACGT"):
                        continue
                    km = oracle.canonical(window)
                    matches = [j for j, nn in enumerate(nums) if km in ogs[nn]]
                    for m in matches:
                        v[m] += lcm // len(matches)
                votes_rows.append(v)
            trng = np.random.default_rng([seed, trial, k, num])
            row = [0] * (d + 1)
            for v in votes_rows:
                mx = v.max()
                idxs = np.nonzero(v == mx)[0]
                c = int(idxs[trng.integers(0, len(idxs))]) if len(idxs) > 1 else int(idxs[0])
                row[c] += 1
            cm.append(row)
        # one-vs-rest accuracy rows, regular == ucol for read-level voting
        lines = []
        for pivot in range(d):
            tp = cm[pivot][pivot]
            fp = fn = tn = 0
            for r in range(d):
                for c in range(d + 1):
                    cur = cm[r][c]
                    if c == pivot and r != pivot:
                        fp += cur
                    elif r == pivot and c != pivot:
                        fn += cur
                    elif r != pivot:
                        tn += cur
            vals = [str(k), str(pivot), str(tp), str(tn), str(fp), str(fn)]
            lines.append(",".join(vals + vals[2:]))
        per_k_lines[str(k)] = lines
    with open(out_path, "w") as fd:
        fd.write("k,pivotnum,TP,TN,FP,FN,TP-U,TN-U,FP-U,FN-U\n")
        for ks_str in sorted(per_k_lines):  # shell-glob (lexicographic) order
            fd.write("\n".join(per_k_lines[ks_str]) + "\n")
    return out_path


def test_exp6_trial_csv_byte_exact(rng, tmp_path):
    """Whole-file byte equality of the exp6 trial accuracy CSV vs an
    oracle build, ks spanning 1/2/3-word widths AND exercising the
    lexicographic concat order (7 sorts after 11/21/33)."""
    pivots, rest = make_world(rng)
    reads = {
        num: [pivots[num][0][i : i + 60] for i in range(0, 240, 20)]
        + [random_dna(rng, 60) for _ in range(4)]
        for num in rest
    }
    ks = [7, 11, 21, 33]
    got = run_exp6(reads, rest, ks, str(tmp_path), read_type="illumina")
    want = oracle_exp6_trial_csv(
        reads, rest, ks, str(tmp_path / "oracle_trial.csv")
    )
    assert open(got, "rb").read() == open(want, "rb").read()


def test_exp4_exp6_end_to_end(rng, tmp_path):
    pivots, rest = make_world(rng)
    ks = [7, 9]
    out = run_exp4(pivots, rest, ks, str(tmp_path))
    lines = open(out).read().strip().split("\n")
    assert len(lines) == len(ks) * len(rest)
    # TP+TN+FP+FN match total weight per pivot row
    first = lines[0].split(",")
    assert first[0] in {"7", "9"}

    reads = {num: [pivots[num][0][i : i + 50] for i in range(0, 250, 25)] for num in rest}
    out6 = run_exp6(reads, rest, ks, str(tmp_path), read_type="illumina")
    lines6 = open(out6).read().strip().split("\n")
    # header printf'd first (exp_type_6.smk:357), then one row per (k, pivot)
    assert lines6[0] == "k,pivotnum,TP,TN,FP,FN,TP-U,TN-U,FP-U,FN-U"
    assert len(lines6) == 1 + len(ks) * len(rest)
    row = [int(float(x)) for x in lines6[1].split(",")]
    # [k, pivot, TP, TN, FP, FN, ...-U] : total reads conserved per k
    assert len(row) == 10
