"""Driver entry points compile and execute."""

import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    jitted = jax.jit(fn)
    action_seq, state_seq, new_state, new_cind = jitted(*example_args)
    jax.block_until_ready(action_seq)
    assert action_seq.shape == (50, 2)
    assert state_seq.shape == (51, 4)
    assert np.all(np.isfinite(np.asarray(action_seq)))
    assert int(new_cind) >= 0


def test_dryrun_multichip_eight_devices():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multihost_two_processes():
    """The jax.distributed bootstrap path executes with process_count==2.

    Spawns the 2-process coordinator rendezvous + cross-process sharded
    solve (benchmarks/multihost_dryrun.py) in fresh subprocesses, so it
    is independent of this process's pinned single-process CPU backend.
    ~20 s; covers the one code path a virtual single-process mesh cannot
    (SURVEY.md §2 distributed-backend checklist).
    """
    import __graft_entry__ as ge

    ge.dryrun_multihost()
