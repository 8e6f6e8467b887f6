"""Pin the driver contract in `__graft_entry__.py`.

The round driver compile-checks `entry()` on a single chip and executes
`dryrun_multichip(8)` on a virtual 8-device CPU mesh; until now nothing in
the suite exercised either, so a refactor of the training step / mesh
helpers could break the driver artifacts without a red test. Both checks
run on the suite's own 8-device CPU mesh (tests/conftest.py).
"""

import jax
import pytest

import __graft_entry__ as graft


@pytest.mark.slow
def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    out = compiled(*args)
    assert out.shape[0] == args[1].shape[0]          # batch preserved
    assert bool(jax.numpy.isfinite(out).all())


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    # asserts internally on finite loss + finite eval FGD
    graft.dryrun_multichip(8)
