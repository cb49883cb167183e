"""Hand-verified golden fixtures for the KMC-semantics oracle.

The oracle (khoice_tpu/oracle/pykmc.py) is the repo's correctness gate —
KMC3 itself is not installable here (zero egress), so these fixtures
second-source it: every expected value below was derived BY HAND from the
KMC3 semantics the reference relies on (canonical = lexicographic
min(kmer, revcomp) under A<C<G<T, reference src/merge_lists.py:60-73;
non-ACGT k-mers skipped; saturating counters; `-ocsum` intersect;
kmers_subtract; histogram lines = #distinct keys per count). If the
oracle and the engine ever agree on a wrong answer, these literals catch
it.
"""

from khoice_tpu import oracle


def test_canonicalization_by_hand():
    # revcomp(GAT) = ATC; A < G so ATC is canonical
    assert oracle.canonical("GAT") == "ATC"
    # revcomp(ATT) = AAT < ATT
    assert oracle.canonical("ATT") == "AAT"
    # palindrome: revcomp(ACGT) == ACGT
    assert oracle.canonical("ACGT") == "ACGT"
    # all-A is its own minimum (revcomp = TTTT)
    assert oracle.canonical("AAAA") == "AAAA"
    # revcomp(TAC) = GTA; G < T
    assert oracle.canonical("TAC") == "GTA"


def test_count_acgt_k2():
    # "ACGT" windows: AC (rc GT -> AC), CG (palindrome), GT (rc AC -> AC)
    assert oracle.count_kmers(["ACGT"], 2) == {"AC": 2, "CG": 1}


def test_count_gattaca_k3():
    # GAT->ATC, ATT->AAT, TTA->TAA, TAC->GTA, ACA->ACA (rc TGT)
    assert oracle.count_kmers(["GATTACA"], 3) == {
        "ATC": 1,
        "AAT": 1,
        "TAA": 1,
        "GTA": 1,
        "ACA": 1,
    }


def test_count_skips_non_acgt():
    # windows: AC, CN (skip), NG (skip), GT (rc AC -> AC)
    assert oracle.count_kmers(["ACNGT"], 2) == {"AC": 2}


def test_count_multi_record_and_saturation():
    # AA appears 4x in AAAAA; cap 2 (KMC -cs)
    assert oracle.count_kmers(["AAAAA"], 2, cs=2) == {"AA": 2}
    # records never span: no k-mer crosses the record boundary
    assert oracle.count_kmers(["AA", "AA"], 2) == {"AA": 2}


def test_set_algebra_by_hand():
    a = {"AC": 1, "CG": 1}
    b = {"AC": 1, "AA": 1}
    # complex union, counts summed
    assert oracle.union_sum([a, b]) == {"AC": 2, "CG": 1, "AA": 1}
    # intersect -ocsum: keys in both, counts summed
    assert oracle.intersect_sum(a, b) == {"AC": 2}
    # kmers_subtract: keys of a absent from b, counts from a
    assert oracle.subtract(a, b) == {"CG": 1}
    # union saturates at cs
    assert oracle.union_sum([{"AA": 3}, {"AA": 4}], cs=5) == {"AA": 5}


def test_set_counts_by_hand():
    assert oracle.set_counts({"AC": 7, "CG": 1}, 1) == {"AC": 1, "CG": 1}


def test_histogram_by_hand():
    # hist[i-1] = #distinct keys with count i (KMC histogram text contract,
    # reference workflow/rules/exp_type_1.smk:210-212)
    assert oracle.histogram({"AC": 2, "CG": 1, "AA": 1}, cx=3) == [2, 1, 0]
    # counts beyond cx are clipped into the last bin by KMC's -cx? No:
    # kmc_tools histogram just doesn't print them; the oracle drops them too
    assert oracle.histogram({"AC": 5}, cx=3) == [0, 0, 0]


def test_sorted_dump_order_by_hand():
    # dump -s sorts lexicographically under A<C<G<T
    d = oracle.count_kmers(["GATTACA"], 3)
    assert [km for km, _ in oracle.sorted_dump(d)] == [
        "AAT",
        "ACA",
        "ATC",
        "GTA",
        "TAA",
    ]


def test_engine_agrees_with_golden():
    """Close the loop: the device engine reproduces the hand values too."""
    import jax.numpy as jnp

    from khoice_tpu.engine import count_codes
    from khoice_tpu.io import encode_records

    t = count_codes(jnp.asarray(encode_records(["GATTACA"])), 3)
    assert dict(t.dump()) == {
        "ATC": 1,
        "AAT": 1,
        "TAA": 1,
        "GTA": 1,
        "ACA": 1,
    }
    t2 = count_codes(jnp.asarray(encode_records(["ACNGT"])), 2)
    assert dict(t2.dump()) == {"AC": 2}
