"""FASTA / FASTA.gz reading and writing (host side).

Covers the file-format surface the reference gets from seqtk/samtools:
- multi-record FASTA (.fna/.fa), optionally gzip-compressed (the reference's
  inputs are `*.fna.gz`, reference: workflow/rules/exp_type_1.smk:158)
- `.fai`-style length accounting (reference: workflow/rules/exp_type_7.smk:177
  uses `samtools faidx` only for total reference length)
- reverse complement (seqtk seq -r role, exp_type_5.smk:101).
"""

from __future__ import annotations

import dataclasses
import gzip
import io
import os
from typing import Iterable, List

__all__ = [
    "FastaRecord",
    "read_fasta",
    "write_fasta",
    "fasta_lengths",
    "total_length",
    "revcomp",
]


@dataclasses.dataclass
class FastaRecord:
    name: str
    seq: str


def _open_maybe_gz(path: str, mode: str = "rt"):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_fasta(path: str) -> List[FastaRecord]:
    records: List[FastaRecord] = []
    name = None
    chunks: List[str] = []
    with _open_maybe_gz(path) as fd:
        for line in fd:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    records.append(FastaRecord(name, "".join(chunks)))
                name = line[1:].split()[0] if len(line) > 1 else ""
                chunks = []
            else:
                chunks.append(line.upper())
        if name is not None:
            records.append(FastaRecord(name, "".join(chunks)))
    return records


def write_fasta(path: str, records: Iterable[FastaRecord], width: int = 60, gz: bool | None = None):
    if gz is None:
        gz = str(path).endswith(".gz")
    fd = gzip.open(path, "wt") if gz else open(path, "w")
    with fd:
        for rec in records:
            fd.write(f">{rec.name}\n")
            for i in range(0, len(rec.seq), width):
                fd.write(rec.seq[i : i + width] + "\n")


def fasta_lengths(path: str) -> List[tuple]:
    """[(name, length)] — the `.fai` columns the reference consumes."""
    return [(r.name, len(r.seq)) for r in read_fasta(path)]


def total_length(path: str) -> int:
    """Total reference length, feeding noise = log4(L)
    (reference: src/analyze_sam.py:41-46)."""
    return sum(l for _, l in fasta_lengths(path))


_COMP = str.maketrans("ACGTNacgtn", "TGCANtgcan")


def revcomp(seq: str) -> str:
    return seq.translate(_COMP)[::-1]
