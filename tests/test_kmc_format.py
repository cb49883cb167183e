"""KMC binary database (.kmc_pre/.kmc_suf) round-trip + engine interop."""

import numpy as np
import pytest

from conftest import random_dna
from khoice_tpu import oracle
from khoice_tpu.engine.kmc_format import (
    default_lut_prefix,
    read_kmc_database,
    write_kmc_database,
)


def test_default_lut_prefix_alignment():
    for k in (5, 9, 12, 21, 31, 49):
        p = default_lut_prefix(k)
        assert 1 <= p <= 12 and (k - p) % 4 == 0, (k, p)


@pytest.mark.parametrize("k", [5, 13, 21, 31])
def test_roundtrip_matches_oracle_counts(rng, tmp_path, k):
    seqs = [random_dna(rng, 600, n_prob=0.01), random_dna(rng, 300)]
    counts = oracle.count_kmers(seqs, k)
    pre, suf = write_kmc_database(str(tmp_path / "db"), counts, k)
    back, params = read_kmc_database(str(tmp_path / "db"))
    assert back == counts
    assert params["kmer_length"] == k
    assert params["total_kmers"] == len(counts)
    assert params["both_strands"] is True


def test_records_sorted_and_lut_consistent(rng, tmp_path):
    k = 9
    counts = oracle.count_kmers([random_dna(rng, 800)], k)
    write_kmc_database(str(tmp_path / "db"), counts, k)
    back, params = read_kmc_database(str(tmp_path / "db"))
    # read-back iteration order is prefix-major = fully sorted
    assert list(back) == sorted(counts)
    assert list(back) == [km for km, _ in oracle.sorted_dump(counts)]


def test_counter_sizes_and_saturation(rng, tmp_path):
    k = 7
    counts = {"A" * 7: 255, "C" * 7: 70000}
    for cs_bytes in (1, 2, 4):
        cl = {km: min(v, (1 << (8 * cs_bytes)) - 1) for km, v in counts.items()}
        write_kmc_database(str(tmp_path / f"db{cs_bytes}"), cl, k,
                           counter_size=cs_bytes)
        back, params = read_kmc_database(str(tmp_path / f"db{cs_bytes}"))
        assert back == cl and params["counter_size"] == cs_bytes


def test_engine_table_to_kmc_and_back(rng, tmp_path):
    """Engine count -> binary DB -> read-back == engine dump."""
    import jax.numpy as jnp

    from khoice_tpu.engine import count_codes
    from khoice_tpu.io import encode_records

    k = 13
    seqs = [random_dna(rng, 500)]
    t = count_codes(jnp.asarray(encode_records(seqs)), k)
    dump = dict(t.dump())
    write_kmc_database(str(tmp_path / "db"), dump, k)
    back, _ = read_kmc_database(str(tmp_path / "db"))
    assert back == dump == oracle.count_kmers(seqs, k)


def test_corrupt_markers_raise(tmp_path, rng):
    k = 5
    counts = oracle.count_kmers([random_dna(rng, 100)], k)
    pre, suf = write_kmc_database(str(tmp_path / "db"), counts, k)
    data = open(pre, "rb").read()
    open(pre, "wb").write(b"XXXX" + data[4:])
    with pytest.raises(ValueError, match="KMCP"):
        read_kmc_database(str(tmp_path / "db"))


def test_table_io_binary_bridge(rng, tmp_path):
    """KmerTable -> .kmc_pre/.kmc_suf -> KmerTable round-trip."""
    import jax.numpy as jnp

    from khoice_tpu.engine import count_codes
    from khoice_tpu.engine.table_io import read_kmc_binary, write_kmc_binary
    from khoice_tpu.io import encode_records

    t = count_codes(jnp.asarray(encode_records([random_dna(rng, 400)])), 11)
    write_kmc_binary(str(tmp_path / "db"), t)
    t2 = read_kmc_binary(str(tmp_path / "db"))
    assert t2.k == 11 and dict(t2.dump()) == dict(t.dump())
