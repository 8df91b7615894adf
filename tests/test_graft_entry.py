"""Driver-contract tests: entry() compiles single-device; dryrun_multichip
runs on the virtual 8-device CPU mesh."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out.tsdf).sum())
    assert np.asarray(out.weights).sum() > 0  # the frame integrated


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_2():
    import __graft_entry__ as ge
    ge.dryrun_multichip(2)
