"""Native FASTA scanner (native/fasta_codec.cpp) vs the Python fallback."""

import gzip
import os

import numpy as np
import pytest

from khoice_tpu.io.fasta import (
    _codec_lib,
    _read_fasta_py,
    read_fasta,
    read_fasta_codes,
)
from khoice_tpu.io.packing import encode_seq

FASTA_TEXT = (
    ">rec1 some description here\n"
    "acgtACGTnN\n"
    "GGGcccTTT\n"
    "\n"
    ">rec2\r\n"
    "AAAA\r\n"
    "cc\r\n"
    "> rec3_leading_space trailing words\n"
    "TTTTTT\n"
    ">empty_seq\n"
    ">last\n"
    "acgt"  # no trailing newline
)


def _write(tmp_path, gz: bool):
    p = os.path.join(str(tmp_path), "t.fna.gz" if gz else "t.fna")
    if gz:
        with gzip.open(p, "wt") as fd:
            fd.write(FASTA_TEXT)
    else:
        with open(p, "w") as fd:
            fd.write(FASTA_TEXT)
    return p


@pytest.mark.skipif(_codec_lib() is None, reason="native codec unavailable")
@pytest.mark.parametrize("gz", [False, True])
def test_native_matches_python_fallback(tmp_path, gz):
    p = _write(tmp_path, gz)
    native = read_fasta(p)
    py = _read_fasta_py(FASTA_TEXT.encode())
    assert [(r.name, r.seq) for r in native] == [(r.name, r.seq) for r in py]
    assert [r.name for r in native] == [
        "rec1", "rec2", "rec3_leading_space", "empty_seq", "last",
    ]
    assert native[0].seq == "ACGTACGTNNGGGCCCTTT"
    assert native[1].seq == "AAAACC"
    assert native[4].seq == "ACGT"


@pytest.mark.skipif(_codec_lib() is None, reason="native codec unavailable")
def test_codes_path_matches_encode(tmp_path):
    p = _write(tmp_path, True)
    codes = read_fasta_codes(p)
    py = _read_fasta_py(FASTA_TEXT.encode())
    assert [c[0] for c in codes] == [r.name for r in py]
    for (_, arr), rec in zip(codes, py):
        np.testing.assert_array_equal(arr, encode_seq(rec.seq))
    # invalids map to 4, bases to 0..3
    assert codes[0][1].tolist()[:10] == [0, 1, 2, 3, 0, 1, 2, 3, 4, 4]


def test_fallback_forced(tmp_path, monkeypatch):
    monkeypatch.setenv("KHOICE_NO_NATIVE", "1")
    p = _write(tmp_path, False)
    recs = read_fasta(p)
    assert [r.name for r in recs] == [
        "rec1", "rec2", "rec3_leading_space", "empty_seq", "last",
    ]
    codes = read_fasta_codes(p)
    np.testing.assert_array_equal(codes[0][1], encode_seq(recs[0].seq))
