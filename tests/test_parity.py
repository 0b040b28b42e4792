"""Convergence-parity harness (tools/parity.py): achieved iteration counts
vs RECORDED BoomerAMG expectations (tools/parity_expected.json), per the
north star (BASELINE.md: within 10% of BoomerAMG at matched settings, with
the documented l1-Jacobi smoother delta folded into the budget)."""

import json
import os

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
EXPECTED = os.path.join(HERE, "..", "tools", "parity_expected.json")


def _fixtures():
    with open(EXPECTED) as fh:
        return json.load(fh)["fixtures"]


@pytest.mark.parametrize("fx", _fixtures(), ids=lambda fx: fx["name"])
def test_parity_fixture(fx, mesh8):
    import jax
    if fx.get("tpu_only") and jax.devices()[0].platform == "cpu":
        pytest.skip(">=2M-row fixture: TPU runs only (tools/parity.py --tpu)")
    from tools.parity import run_fixture
    iters, converged = run_fixture(fx, mesh8)
    assert converged
    assert iters <= fx["budget_iters"], (
        f"{fx['name']}: {iters} iters > budget {fx['budget_iters']} "
        f"(recorded BoomerAMG expectation {fx['expected_iters']})")
