"""Experiment 2: pivot-vs-group k-mer uniqueness.

Replaces workflow/rules/exp_type_2.smk: per (k, dataset), the out-pivot
genome's k-mer *set* is intersected (-ocsum) with and subtracted from the
rest-of-group union; the two histograms feed summarize_histogram_type2.
Across-groups variant: the pivot is compared against the union of every
OTHER dataset's group set (exp_type_2.smk:263-283).

Fast path (round-4): the whole k grid rides the shared doubled-text sort
(engine/ksweep_classify.py) — ONE sort per dataset serves every k's
subtract/intersect histograms (within scope), and ONE sort over all
pivots+groups serves the across scope, instead of one pivot sort + one
occurrence sort per (k, dataset).  ks the plan can't serve (tiny grids,
>32 members) fall back to the original per-k table ops; both paths are
bit-identical (tested against the oracle).

Output CSVs use the reference's row ordering — dataset-major, k inner
(get_within_group_histogram_files, exp_type_2.smk:153-169) — and header
strings (exp_type_2.smk:405-407, 522-524).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np

from ..engine.session import KmerEngine
from ..io.packing import encode_records
from ..reports.csvio import read_hist_txt, write_csv_rows, write_hist_txt
from ..reports.metrics import summarize_histogram_type2

WITHIN_HEADER = (
    "group_num,k,percent_1_occ,percent_25_or_less,percent_25_to_75,percent_75_or_more,"
    "unique_stat,unique_stat_norm,delta_frac,delta_frac_norm\n"
)
ACROSS_HEADER = (
    "group_num,k,percent_1_occ,percent_2_to_3,percent_4_to_8,percent_9_more,"
    "unique_stat,unique_stat_norm,delta_frac,delta_frac_norm\n"
)


def _normalize_and_write(path, header, all_metrics, group_ids):
    for gid in group_ids:
        values = [m[8] for m in all_metrics if m[0] == gid]
        mx = max(values)
        for m in all_metrics:
            if m[0] == gid:
                m.append(round(m[8] / mx, 4))
    write_csv_rows(path, header, all_metrics)


def _hists_from_counts(cnt: np.ndarray, cx: int):
    """(sub_hist, inter_hist) from sweep counts: cnt[0] classes are
    pivot-only (subtract output, all count 1); cnt[j] classes intersect j
    members, i.e. `-ocsum` count 1 + j (exp_type_2.smk:183-184)."""
    sub = [0] * cx
    sub[0] = int(cnt[0])
    inter = [0] * cx
    for j in range(1, cnt.shape[0]):
        if j < cx:
            inter[j] = int(cnt[j])
    return sub, inter


def _per_k_pair(eng, pivot_codes, rest_codes_list, k, union_cs, count_cs, hist_cx):
    """Original per-k path: (sub_hist, inter_hist) for one (pivot, rest)."""
    from ..engine.occurrence import occurrence_table

    pivot_set = eng.set_counts(
        eng.count_codes(pivot_codes, k, cs=count_cs), 1
    )
    rest_union = eng.compact(occurrence_table(rest_codes_list, k, cs=union_cs))
    inter = eng.intersect_sum(pivot_set, rest_union)
    sub = eng.subtract(pivot_set, rest_union)
    return eng.histogram(sub, cx=hist_cx), eng.histogram(inter, cx=hist_cx)


def run_exp2(
    pivots: Dict[int, List[str]],
    rest_of_set: Dict[int, List[List[str]]],
    k_values: Sequence[int],
    out_dir: str,
    engine: KmerEngine | None = None,
    union_cs: int = 5000,
    count_cs: int = 255,
    hist_cx: int = 10000,
    mesh=None,
) -> Dict[str, str]:
    """pivots: {num: pivot record seqs}; rest_of_set excludes the pivot
    (exp2 is always out-pivot: input_type_2 copies exp0_nonpivot_genomes).

    Passing a jax.sharding.Mesh runs both scopes' sweeps SPMD over its
    key-range axis (dist/ksweep_classify.py) — bit-identical CSVs, the
    reference's per-(k, dataset) core fan-out (exp_type_2.smk:354-380)
    collapsed into sharded programs.
    """
    from ..engine.ksweep_classify import (
        multi_pivot_counts_sweep,
        pivot_rest_counts_sweep,
    )

    if mesh is not None:
        from ..dist.ksweep_classify import (
            sharded_multi_pivot_counts_sweep,
            sharded_pivot_rest_counts_sweep,
        )

        def pivot_rest_counts_sweep(members, ks, cs):  # noqa: F811
            return sharded_pivot_rest_counts_sweep(mesh, members, ks, cs=cs)

        def multi_pivot_counts_sweep(members, D, ks, cs):  # noqa: F811
            return sharded_multi_pivot_counts_sweep(mesh, members, D, ks, cs=cs)

    eng = engine or KmerEngine()
    nums = sorted(rest_of_set)
    D = len(nums)

    pivot_codes = {num: encode_records(pivots[num]) for num in nums}
    rest_codes = {
        num: [encode_records(g) for g in rest_of_set[num]] for num in nums
    }
    group_codes = {
        num: encode_records([s for g in rest_of_set[num] for s in g])
        for num in nums
    }

    # (num, k) -> (sub_hist, inter_hist), for both scopes
    within: Dict[tuple, tuple] = {}
    across: Dict[tuple, tuple] = {}

    # WITHIN scope: per dataset, one shared sort serves the whole grid
    fallback_within = set()
    for num in nums:
        counts, rem = pivot_rest_counts_sweep(
            [pivot_codes[num]] + rest_codes[num], k_values, cs=union_cs
        )
        for k, cnt in counts.items():
            within[(num, k)] = _hists_from_counts(cnt, hist_cx)
        fallback_within.update(rem)

    # ACROSS scope: one combined sort over all pivots + all group texts
    # (pivot num bits 0..D-1, group bits D..2D-1; own group excluded in
    # the scan), when 2D members fit the sweep's gid mask
    members_across = [pivot_codes[num] for num in nums] + [
        group_codes[num] for num in nums
    ]
    counts_across, rem_across = multi_pivot_counts_sweep(
        members_across, D, k_values, cs=union_cs
    )
    for k, cnt in counts_across.items():
        for i, num in enumerate(nums):
            across[(num, k)] = _hists_from_counts(cnt[i], hist_cx)
    fallback_across = set(rem_across)

    # per-k fallback (tiny grids / >32 members): original table ops
    for k in sorted(fallback_within):
        for num in nums:
            within[(num, k)] = _per_k_pair(
                eng, pivot_codes[num], rest_codes[num], k,
                union_cs, count_cs, hist_cx,
            )
    for k in sorted(fallback_across):
        group_sets = {
            num: eng.set_counts(
                eng.count_codes(group_codes[num], k, cs=count_cs), 1
            )
            for num in nums
        }
        for num in nums:
            pivot_set = eng.set_counts(
                eng.count_codes(pivot_codes[num], k, cs=count_cs), 1
            )
            others = [group_sets[j] for j in nums if j != num]
            across_union = eng.union(others, cs=union_cs)
            ainter = eng.intersect_sum(pivot_set, across_union)
            asub = eng.subtract(pivot_set, across_union)
            across[(num, k)] = (
                eng.histogram(asub, cx=hist_cx),
                eng.histogram(ainter, cx=hist_cx),
            )

    for k in k_values:
        for scope, data in (("within", within), ("across", across)):
            for num in nums:
                base = os.path.join(
                    out_dir,
                    f"{scope}_dataset_results_type_2/k_{k}/dataset_{num}",
                )
                write_hist_txt(
                    os.path.join(base, f"subtract/dataset_{num}_pivot_subtract_group.hist.txt"),
                    data[(num, k)][0],
                    cx=hist_cx,
                )
                write_hist_txt(
                    os.path.join(base, f"intersect/dataset_{num}_pivot_intersect_group.hist.txt"),
                    data[(num, k)][1],
                    cx=hist_cx,
                )

    num_members = {num: len(rest_of_set[num]) for num in nums}

    # within CSV (rows: dataset-major, k inner)
    rows = []
    for num in nums:
        for k in k_values:
            sub_h, int_h = within[(num, k)]
            rows.append(
                [f"group_{num}", str(k)]
                + summarize_histogram_type2(sub_h, int_h, num_members[num], False, int(k))
            )
    within_csv = os.path.join(out_dir, "within_dataset_analysis_type_2/within_dataset_analysis.csv")
    _normalize_and_write(within_csv, WITHIN_HEADER, rows, [f"group_{n}" for n in nums])

    # across CSV
    rows = []
    for num in nums:
        for k in k_values:
            sub_h, int_h = across[(num, k)]
            rows.append(
                [f"group_{num}", str(k)]
                + summarize_histogram_type2(sub_h, int_h, len(nums), True, int(k))
            )
    across_csv = os.path.join(out_dir, "across_dataset_analysis_type_2/across_dataset_analysis.csv")
    _normalize_and_write(across_csv, ACROSS_HEADER, rows, [f"group_{n}" for n in nums])

    return {"within": within_csv, "across": across_csv}
