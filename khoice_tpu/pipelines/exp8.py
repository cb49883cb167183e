"""Experiment 8: MEM threshold sweep over read queries.

Replaces workflow/rules/exp_type_8.smk: features are extracted at the low
threshold -t 2 (exp_type_8.smk:192-201), then the analysis threshold t is
swept over the t-grid (workflow/Snakefile:39) producing one confusion
matrix per t.

The reference's exp8 analysis stage is bit-rotten (SAMs written under
sam_type_8/ but read from sam/, and names only exp7 produces — SURVEY.md
section 2.1 item 11); this implements the evidently intended behavior via
the working exp7 pattern, as the survey contract prescribes.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from ..config import default_t_values
from .mem_common import run_mem_experiment

EXTRACT_THRESHOLD = 2  # reference exp_type_8.smk:192-201


def run_exp8(
    pivot_reads: Dict[int, List[str]],
    datasets: Dict[int, List[List[str]]],
    out_dir: str,
    t_values: Sequence[int] | None = None,
    mem_types: Sequence[str] = ("mems", "half_mems"),
    seed: int = 0,
) -> dict:
    ts = [int(t) for t in (t_values or default_t_values())]
    out = {}
    for mem_type in mem_types:
        out[mem_type] = run_mem_experiment(
            queries=pivot_reads,
            datasets=datasets,
            out_dir=out_dir,
            mem_type=mem_type,
            extract_threshold=EXTRACT_THRESHOLD,
            read_level=True,
            analysis_thresholds=ts,
            seed=seed,
            tag="type_8",
        )
    return out
