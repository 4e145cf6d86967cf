"""Hardware-gated Pallas/MXU kernel tests (skipped on CPU CI).

Run on the real chip with::

    TABMAT_TPU_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py -v

CPU CI skips these (the kernels are TPU-only); the same numerics are
exercised continuously on hardware by ``bench.py`` and the diagnostics.
"""

import numpy as np
import pytest

import tabmat_tpu as tm
from tabmat_tpu._config import on_tpu

pytestmark = pytest.mark.skipif(not on_tpu(), reason="needs the TPU platform")

import jax.numpy as jnp  # noqa: E402


def test_pallas_table_gather_f64_exact():
    from tabmat_tpu.ops import pallas_gather as pg

    rng = np.random.default_rng(0)
    n, W = 200_000, 3000
    codes = rng.integers(-1, W, n).astype(np.int32)
    c2d = jnp.asarray(pg.build_codes2d(codes))
    v = jnp.asarray(rng.standard_normal(W))
    got = np.asarray(pg.table_gather(v, c2d, n))
    ref = np.where(codes >= 0, np.asarray(v)[np.clip(codes, 0, None)], 0.0)
    np.testing.assert_array_equal(got, ref)  # bit-exact vs device values


def test_mxu_segsum_exact():
    from tabmat_tpu.ops import pallas_segsum as ps

    rng = np.random.default_rng(1)
    n, W = 300_000, 2000
    codes = rng.integers(-1, W, n).astype(np.int32)
    cc = jnp.asarray(ps.build_codes_col(codes))
    v = rng.standard_normal(n) * np.exp(rng.uniform(-6, 6, n))
    got = np.asarray(ps.segsum(jnp.asarray(v), cc, W))
    ref = np.zeros(W)
    np.add.at(ref, codes[codes >= 0], v[codes >= 0])
    assert np.abs(got - ref).max() / np.abs(v).sum() < 1e-15


def test_wide_sandwich_matches_scipy():
    from scipy import sparse as sps

    from tabmat_tpu.ops import sparse_wide

    rng = np.random.default_rng(2)
    A = sps.random(3000, 600, density=0.02, random_state=3, format="csc")
    plan = sparse_wide.WideSandwichPlan(A)
    d = rng.random(3000)  # GLM-style non-negative weights
    S = np.asarray(sparse_wide.wide_sandwich(plan, jnp.asarray(d)))
    Sref = (A.T @ sps.diags(d) @ A).toarray()
    assert np.abs(S - Sref).max() / np.abs(Sref).max() < 1e-12


def test_cat_matvec_class_layer_on_tpu():
    rng = np.random.default_rng(3)
    n, W = 100_000, 5000
    codes = rng.integers(0, W, n).astype(np.int32)
    cm = tm.CategoricalMatrix(codes, categories=np.arange(W), drop_first=True)
    v = rng.standard_normal(W - 1)
    got = np.asarray(cm.matvec(v))
    eff = codes - 1
    ref = np.where(eff >= 0, v[np.clip(eff, 0, None)], 0.0)
    assert np.abs(got - ref).max() < 1e-13
