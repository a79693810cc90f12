"""The driver's compile-check entry points must stay importable and
executable: entry() jits single-device, dryrun_multichip() shards the
full step over a virtual mesh (tests run on 8 CPU devices; see
conftest.py)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

import __graft_entry__ as ge  # noqa: E402


def test_entry_compiles_and_runs():
    import jax

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    # Carry pytree comes back with the same structure and finite data.
    jax.tree_util.tree_map(
        lambda x: np.testing.assert_array_equal(
            np.isfinite(np.asarray(x)), True
        ),
        out,
    )


@pytest.mark.parametrize("n", [1, 2, 8])
def test_dryrun_multichip(n):
    ge.dryrun_multichip(n)


def test_dryrun_multichip_bootstraps_subprocess():
    """Asking for more devices than this process has must re-exec the
    check in a fresh CPU subprocess with the forced device count —
    the driver environment (one real TPU chip, jax pre-imported) relies
    on this path."""

    ge.dryrun_multichip(16)
