"""Driver-contract tests: entry() compiles, dryrun_multichip executes."""

import importlib.util
import os

import jax
import numpy as np
import pytest


def _load_graft():
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs():
    mod = _load_graft()
    fn, example_args = mod.entry()
    out = jax.jit(fn)(*example_args)
    out = np.asarray(jax.block_until_ready(out))
    assert out.shape == (example_args[1].shape[0], 3)
    assert np.isfinite(out).all()


@pytest.mark.parametrize("n", [4, 8])
def test_dryrun_multichip(n):
    if len(jax.devices()) < n:
        pytest.skip("not enough virtual devices")
    mod = _load_graft()
    mod.dryrun_multichip(n)
