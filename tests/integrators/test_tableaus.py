"""Butcher-tableau consistency checks for every registered integrator.

Mirrors the reference's strongest test pattern (``tests/integrators/test_rk4.py:68-118``):
Σb = 1 and row-sums of `a` equal the nodes `c`.
"""

import numpy as np
import pytest

from torchebm_tpu.integrators import (
    INTEGRATOR_REGISTRY,
    BaseRungeKuttaIntegrator,
    get_integrator,
)

RK_NAMES = sorted(
    {
        name
        for name, cls in INTEGRATOR_REGISTRY.items()
        if issubclass(cls, BaseRungeKuttaIntegrator)
    }
)


@pytest.mark.parametrize("name", RK_NAMES)
def test_b_weights_sum_to_one(name):
    integ = get_integrator(name)
    assert abs(sum(integ.tableau_b) - 1.0) < 1e-12


@pytest.mark.parametrize("name", RK_NAMES)
def test_row_sums_match_c(name):
    integ = get_integrator(name)
    for i, row in enumerate(integ.tableau_a):
        np.testing.assert_allclose(sum(row), integ.tableau_c[i], atol=1e-12)


@pytest.mark.parametrize("name", RK_NAMES)
def test_tableau_shapes(name):
    integ = get_integrator(name)
    s = integ.n_stages
    assert len(integ.tableau_b) == s
    assert len(integ.tableau_a) == s
    for i, row in enumerate(integ.tableau_a):
        assert len(row) in (i, i + 1)  # explicit or DIRK diagonal


@pytest.mark.parametrize("name", RK_NAMES)
def test_error_weights_consistency(name):
    """Embedded-pair weights must sum to 0 (both pairs integrate constants exactly)."""
    integ = get_integrator(name)
    if integ.error_weights is None:
        return
    assert integ.order is not None
    expected_len = integ.n_stages + (1 if integ.fsal else 0)
    assert len(integ.error_weights) == expected_len
    assert abs(sum(integ.error_weights)) < 1e-10


def test_first_node_zero_for_fsal():
    for name in RK_NAMES:
        integ = get_integrator(name)
        if integ.fsal:
            assert integ.tableau_c[0] == 0.0
