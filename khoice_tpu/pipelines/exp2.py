"""Experiment 2: pivot-vs-group k-mer uniqueness.

Replaces workflow/rules/exp_type_2.smk: per (k, dataset), the out-pivot
genome's k-mer *set* is intersected (-ocsum) with and subtracted from the
rest-of-group union; the two histograms feed summarize_histogram_type2.
Across-groups variant: the pivot is compared against the union of every
OTHER dataset's group set (exp_type_2.smk:263-283).

Output CSVs use the reference's row ordering — dataset-major, k inner
(get_within_group_histogram_files, exp_type_2.smk:153-169) — and header
strings (exp_type_2.smk:405-407, 522-524).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

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


def run_exp2(
    pivots: Dict[int, List[str]],
    rest_of_set: Dict[int, List[List[str]]],
    k_values: Sequence[int],
    out_dir: str,
    engine: KmerEngine | None = None,
    union_cs: int = 5000,
    count_cs: int = 255,
    hist_cx: int = 10000,
) -> Dict[str, str]:
    """pivots: {num: pivot record seqs}; rest_of_set excludes the pivot
    (exp2 is always out-pivot: input_type_2 copies exp0_nonpivot_genomes).
    """
    eng = engine or KmerEngine()
    nums = sorted(rest_of_set)

    # (num, k) -> (sub_hist, inter_hist), for both scopes
    within: Dict[tuple, tuple] = {}
    across: Dict[tuple, tuple] = {}

    for k in k_values:
        pivot_sets = {
            num: eng.set_counts(
                eng.count_codes(encode_records(pivots[num]), k, cs=count_cs), 1
            )
            for num in nums
        }
        # counted union (count = #genomes containing) in one fused sort per
        # dataset (engine/occurrence.py replaces per-genome count + union)
        from ..engine.occurrence import occurrence_table

        rest_unions = {}
        group_sets = {}
        for num in nums:
            rest_unions[num] = eng.compact(
                occurrence_table(
                    [encode_records(g) for g in rest_of_set[num]], k, cs=union_cs
                )
            )
            group_sets[num] = eng.set_counts(rest_unions[num], 1)

        for num in nums:
            inter = eng.intersect_sum(pivot_sets[num], rest_unions[num])
            sub = eng.subtract(pivot_sets[num], rest_unions[num])
            within[(num, k)] = (eng.histogram(sub, cx=hist_cx), eng.histogram(inter, cx=hist_cx))

            others = [group_sets[j] for j in nums if j != num]
            across_union = eng.union(others, cs=union_cs)
            ainter = eng.intersect_sum(pivot_sets[num], across_union)
            asub = eng.subtract(pivot_sets[num], across_union)
            across[(num, k)] = (eng.histogram(asub, cx=hist_cx), eng.histogram(ainter, cx=hist_cx))

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
