"""Driver-contract smoke tests: entry() compiles, dryrun_multichip runs."""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_entry_jits():
    fn, example_args = graft.entry()
    out = jax.jit(fn)(*example_args)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
