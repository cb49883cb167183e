"""KmerTable persistence — the `.kmc_pre`/`.kmc_suf` database-file role.

Every edge in the reference's DAG is a KMC database pair on disk
(reference: workflow/rules/exp_type_1.smk:160-161); stages resume because
satisfied outputs are skipped. The engine's equivalent: a table saved as a
compact .npz (present keys + counts only), plus the KMC-compatible text
formats (sorted dump, histogram) emitted by reports/csvio and
KmerTable.dump().
"""

from __future__ import annotations

import numpy as np

from .table import KmerTable, table_from_host


def save_table(path: str, t: KmerTable) -> None:
    keys, counts = t.to_host()
    np.savez_compressed(path, k=np.int64(t.k), keys=keys, counts=counts)


def load_table(path: str, capacity: int | None = None) -> KmerTable:
    with np.load(path) as data:
        k = int(data["k"])
        keys = data["keys"]
        counts = data["counts"]
    return table_from_host(k, keys, counts, capacity=capacity)


def write_dump_txt(path: str, t: KmerTable) -> None:
    """`kmc_tools transform ... dump -s` text format: KMER\\tCOUNT, sorted
    (reference exp_type_4.smk:255-258)."""
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fd:
        for kmer, count in t.dump():
            fd.write(f"{kmer}\t{count}\n")


def read_dump_txt(path: str, k: int, capacity: int | None = None) -> KmerTable:
    from .table import encode_kmer

    kmers, counts = [], []
    with open(path) as fd:
        for line in fd:
            if line.strip():
                km, c = line.split()
                kmers.append(encode_kmer(km))
                counts.append(int(c))
    keys = np.stack(kmers) if kmers else np.zeros((0, 1), np.uint32)
    return table_from_host(k, keys, np.array(counts, np.uint32), capacity=capacity)


def write_kmc_binary(path_prefix: str, t: KmerTable,
                     counter_size: int = 4) -> tuple:
    """Export a KmerTable as a KMC binary database pair
    (.kmc_pre/.kmc_suf; engine/kmc_format.py layout)."""
    from .kmc_format import write_kmc_database

    return write_kmc_database(path_prefix, dict(t.dump()), t.k,
                              counter_size=counter_size)


def read_kmc_binary(path_prefix: str, capacity: int | None = None) -> KmerTable:
    """Import a KMC binary database pair into a KmerTable."""
    from .kmc_format import read_kmc_database
    from .table import encode_kmer

    counts_dict, params = read_kmc_database(path_prefix)
    k = params["kmer_length"]
    kmers = sorted(counts_dict)
    keys = (
        np.stack([encode_kmer(km) for km in kmers])
        if kmers
        else np.zeros((0, 1), np.uint32)
    )
    counts = np.array([counts_dict[km] for km in kmers], np.uint32)
    return table_from_host(k, keys, counts, capacity=capacity)
