"""Plot suite — matplotlib equivalents of the reference's offline R scripts.

The reference's analysis/*.R are hand-edited-path ggplot2 scripts outside
the workflow DAG (SURVEY.md section 2.1 item 21). Equivalents here read the
same CSVs the pipelines emit:

- plot_type1: stacked occurrence-band bars + uniqueness-statistic curves
  with second derivative (analysis/kmer_plots_type_1.R:30-129,252-278)
- plot_type2: pivot-vs-group variant (kmer_plots_type_2.R)
- plot_type3: grouped bars of intersection percent (kmer_plots_type_3.R)
- plot_confusion_heatmap + plot_accuracy_curves: type4/5/6/7 outputs
- plot_species_comparison: F1 +/- sd ribbons across trials
  (species_overall_comparison.R:45-92)
- plot_database_percent: uniqueness vs database size
  (database_percent_comparison.R)
"""

from __future__ import annotations

import csv
import math
import os
from typing import Dict, List, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

BAND_COLS_T1 = [
    "percent_1_occ",
    "percent_25_or_less",
    "percent_25_to_75",
    "percent_75_or_more",
]


def _read_csv(path: str) -> List[dict]:
    with open(path) as fd:
        return list(csv.DictReader(fd))


def _save(fig, out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_type1(step5_csv: str, out_path: str, band_cols: Optional[List[str]] = None) -> str:
    """Stacked bars of occurrence bands per (group, k) + unique_stat curve."""
    rows = _read_csv(step5_csv)
    bands = band_cols or [c for c in rows[0] if c.startswith("percent_")]
    groups = sorted({r["group_num"] for r in rows})
    fig, axes = plt.subplots(
        2, len(groups), figsize=(4 * len(groups), 7), squeeze=False
    )
    for gi, group in enumerate(groups):
        sub = [r for r in rows if r["group_num"] == group]
        ks = [int(r["k"]) for r in sub]
        bottom = np.zeros(len(sub))
        ax = axes[0][gi]
        for band in bands:
            vals = np.array([float(r[band]) for r in sub])
            ax.bar(range(len(ks)), vals, bottom=bottom, label=band)
            bottom += vals
        ax.set_xticks(range(len(ks)))
        ax.set_xticklabels(ks, rotation=90, fontsize=6)
        ax.set_title(group)
        ax.set_xlabel("k")
        if gi == 0:
            ax.set_ylabel("fraction of distinct k-mers")
            ax.legend(fontsize=6)
        ax2 = axes[1][gi]
        stat = np.array([float(r["unique_stat_norm"]) for r in sub])
        ax2.plot(ks, stat, marker="o", ms=3, label="unique_stat_norm")
        if len(stat) >= 3:
            d2 = np.gradient(np.gradient(stat, ks), ks)
            ax2.plot(ks, d2, ls="--", label="2nd derivative")
        ax2.set_xlabel("k")
        if gi == 0:
            ax2.legend(fontsize=6)
    return _save(fig, out_path)


plot_type2 = plot_type1  # identical shape over the exp2 CSV schema


def plot_type3(final_csv: str, out_path: str) -> str:
    """Grouped bars: intersection percent per (pivot, dataset) across k."""
    rows = _read_csv(final_csv)
    read_types = sorted({r["read_type"] for r in rows})
    pivots = sorted({r["pivot_num"] for r in rows})
    fig, axes = plt.subplots(
        len(read_types), len(pivots), figsize=(4 * len(pivots), 3 * len(read_types)),
        squeeze=False,
    )
    for ri, rt in enumerate(read_types):
        for pi, p in enumerate(pivots):
            ax = axes[ri][pi]
            sub = [r for r in rows if r["read_type"] == rt and r["pivot_num"] == p]
            datasets = sorted({r["dataset_num"] for r in sub})
            for ds in datasets:
                dsub = [r for r in sub if r["dataset_num"] == ds]
                ks = [int(r["k"]) for r in dsub]
                ax.plot(ks, [float(r["intersection_percent"]) for r in dsub],
                        marker="o", ms=3, label=f"dataset {ds}")
            ax.set_title(f"{rt} pivot {p}", fontsize=8)
            ax.set_xlabel("k")
            if pi == 0:
                ax.set_ylabel("intersection %")
                ax.legend(fontsize=6)
    return _save(fig, out_path)


def plot_confusion_heatmap(matrix_csv: str, out_path: str, labels: Optional[List[str]] = None) -> str:
    with open(matrix_csv) as fd:
        matrix = np.array(
            [[float(x) for x in line.strip().split(",")] for line in fd if line.strip()]
        )
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(matrix, cmap="viridis")
    for (i, j), v in np.ndenumerate(matrix):
        ax.text(j, i, f"{v:.0f}", ha="center", va="center", color="w", fontsize=7)
    fig.colorbar(im)
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    if labels:
        ax.set_xticks(range(len(labels)), labels, rotation=45, fontsize=7)
        ax.set_yticks(range(len(matrix)), labels[: len(matrix)], fontsize=7)
    return _save(fig, out_path)


def _f1(tp, tn, fp, fn):
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom else 0.0


def plot_accuracy_curves(acc_csv: str, out_path: str, num_cols: int = 10) -> str:
    """F1 per pivot across k from a [k,pivot,TP,TN,FP,FN,...] CSV."""
    series: Dict[str, List[tuple]] = {}
    with open(acc_csv) as fd:
        for line in fd:
            f = line.strip().split(",")
            if len(f) < 6 or f[0] == "k":  # skip trial-CSV header
                continue
            k, pivot = int(float(f[0])), f[1]
            tp, tn, fp, fn = (float(x) for x in f[2:6])
            series.setdefault(pivot, []).append((k, _f1(tp, tn, fp, fn)))
    fig, ax = plt.subplots(figsize=(6, 4))
    for pivot, pts in sorted(series.items()):
        pts.sort()
        ax.plot([p[0] for p in pts], [p[1] for p in pts], marker="o", ms=3,
                label=f"pivot {pivot}")
    ax.set_xlabel("k")
    ax.set_ylabel("F1")
    ax.legend(fontsize=7)
    return _save(fig, out_path)


def plot_species_comparison(
    trial_csvs: Sequence[str], out_path: str
) -> str:
    """Mean F1 +/- sd ribbon across trials per k
    (species_overall_comparison.R:45-92 role)."""
    per_k: Dict[int, List[float]] = {}
    for path in trial_csvs:
        with open(path) as fd:
            for line in fd:
                f = line.strip().split(",")
                if len(f) < 6 or f[0] == "k":  # skip trial-CSV header
                    continue
                k = int(float(f[0]))
                tp, tn, fp, fn = (float(x) for x in f[2:6])
                per_k.setdefault(k, []).append(_f1(tp, tn, fp, fn))
    ks = sorted(per_k)
    mean = np.array([np.mean(per_k[k]) for k in ks])
    # sample sd (ddof=1) to match R's sd(); 0 for single-trial data
    sd = np.array(
        [np.std(per_k[k], ddof=1) if len(per_k[k]) > 1 else 0.0 for k in ks]
    )
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(ks, mean, marker="o", ms=3)
    ax.fill_between(ks, mean - sd, mean + sd, alpha=0.3)
    ax.set_xlabel("k")
    ax.set_ylabel("F1 (mean +/- sd across trials)")
    return _save(fig, out_path)


def plot_species_read_comparison(
    trial_csvs_by_read_type: Dict[str, Sequence[str]], out_path: str
) -> str:
    """Read-level F1 ribbons across k, one line pair per read type
    (species_read_comparison.R:32-68 role, over exp6 trial CSVs).

    Input CSVs follow exp6's trial schema
    `k,pivot,TP,TN,FP,FN,TP-U,TN-U,FP-U,FN-U` (exp_type_6.smk:357-361);
    for each read type ("short"/"long") the solid line is mean F1 of the
    base columns and the dashed line is mean F1 of the with-unidentified
    columns (the R script's f1_avg vs f12_avg), each with a +/- sd ribbon
    across trials.
    """
    fig, ax = plt.subplots(figsize=(6, 4))
    for read_type in sorted(trial_csvs_by_read_type):
        per_k: Dict[int, List[float]] = {}
        per_k_u: Dict[int, List[float]] = {}
        for path in trial_csvs_by_read_type[read_type]:
            with open(path) as fd:
                for line in fd:
                    f = line.strip().split(",")
                    if len(f) < 10 or f[0] == "k":  # skip trial-CSV header
                        continue
                    k = int(float(f[0]))
                    tp, tn, fp, fn = (float(x) for x in f[2:6])
                    tpu_, tnu, fpu, fnu = (float(x) for x in f[6:10])
                    per_k.setdefault(k, []).append(_f1(tp, tn, fp, fn))
                    per_k_u.setdefault(k, []).append(_f1(tpu_, tnu, fpu, fnu))
        for data, style, label in (
            (per_k, "-", f"{read_type} F1"),
            (per_k_u, "--", f"{read_type} F1 (with unidentified)"),
        ):
            ks = sorted(data)
            if not ks:
                continue
            mean = np.array([np.mean(data[k]) for k in ks])
            # sample sd (ddof=1) to match R's sd(); 0 for single-trial data
            sd = np.array(
                [np.std(data[k], ddof=1) if len(data[k]) > 1 else 0.0 for k in ks]
            )
            (line,) = ax.plot(ks, mean, style, marker="o", ms=3, label=label)
            ax.fill_between(ks, mean - sd, mean + sd, alpha=0.2,
                            color=line.get_color())
    ax.set_xlabel("Kmer length (k)")
    ax.set_ylabel("F1")
    ax.legend(fontsize=7)
    return _save(fig, out_path)


def plot_database_percent(
    csv_by_percent: Dict[int, str], out_path: str
) -> str:
    """unique_stat_norm vs database size percent
    (database_percent_comparison.R role). csv_by_percent maps the percent
    of the database used to that run's step_5 CSV."""
    fig, ax = plt.subplots(figsize=(6, 4))
    for pct in sorted(csv_by_percent):
        rows = _read_csv(csv_by_percent[pct])
        ks = [int(r["k"]) for r in rows]
        vals = [float(r["unique_stat_norm"]) for r in rows]
        ax.plot(ks, vals, marker="o", ms=3, label=f"{pct}% of database")
    ax.set_xlabel("k")
    ax.set_ylabel("unique_stat_norm")
    ax.legend(fontsize=7)
    return _save(fig, out_path)
