"""Doctest battery over the public modules (reference runs
``pytest --doctest-modules src`` — SURVEY §4)."""

import doctest

import pytest

import tabmat_tpu
import tabmat_tpu.constructors
import tabmat_tpu.formula.api
import tabmat_tpu.formula.contrasts
import tabmat_tpu.models.categorical
import tabmat_tpu.models.dense


@pytest.mark.parametrize(
    "module",
    [
        tabmat_tpu.constructors,
        tabmat_tpu.formula.api,
        tabmat_tpu.formula.contrasts,
        tabmat_tpu.models.categorical,
        tabmat_tpu.models.dense,
    ],
    ids=lambda m: m.__name__,
)
def test_module_doctests(module):
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures in {module.__name__}"
    # the battery only counts if examples actually ran somewhere
    if module is tabmat_tpu.constructors:
        assert results.attempted > 0
