"""Experiment 7: read-level MEM/half-MEM confusion matrix.

Replaces workflow/rules/exp_type_7.smk: matching statistics of each
pivot's reads against the combined all-dataset reference, MEM extraction,
per-dataset locate with one best hit (-m 1, exp_type_7.smk:254), and the
read-level weight-vote analysis with noise = log4(total combined length)
(exp_type_7.smk:169-178, src/analyze_sam.py:110-147).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from .mem_common import run_mem_experiment


def run_exp7(
    pivot_reads: Dict[int, List[str]],
    datasets: Dict[int, List[List[str]]],
    out_dir: str,
    threshold: int = 15,
    mem_types: Sequence[str] = ("mems", "half_mems"),
    seed: int = 0,
) -> dict:
    out = {}
    for mem_type in mem_types:
        res = run_mem_experiment(
            queries=pivot_reads,
            datasets=datasets,
            out_dir=out_dir,
            mem_type=mem_type,
            extract_threshold=threshold,
            read_level=True,
            seed=seed,
            tag="type_7",
        )
        out[mem_type] = res[0]
    return out
