"""Driver-contract tests: __graft_entry__.entry() must jit-compile and
dryrun_multichip(n) must run a full sharded train step on the virtual mesh.
The external driver runs these on real hardware; this keeps the contract
from rotting between runs."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)
