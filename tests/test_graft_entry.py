"""Driver hooks stay runnable: entry() compiles and dryrun_multichip works."""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = fn(*args)
    hist = np.asarray(out[0])
    assert hist.sum() > 0  # some k-mers were counted
    assert hist[hist.nonzero()].min() > 0


@pytest.mark.heavy
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
