"""Metric parity with reference utils/metrics.py."""

import numpy as np
import numpy.testing as npt
import pytest

from blurry_edges_tpu.eval.metrics import eval_depth

from . import oracle

rng = np.random.default_rng(9)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")
def test_eval_depth_parity():
    ref = oracle.load_module("utils/metrics.py", "ref_metrics")
    pred = rng.uniform(0.0, 1.3, size=(3, 60, 60))
    gt = rng.uniform(0.75, 1.18, size=(3, 60, 60))
    msk = pred > 0.2
    ours = eval_depth(pred, gt, msk, crop=10)
    theirs = ref.eval_depth(pred, gt, msk, crop=10)
    npt.assert_allclose(ours, theirs, rtol=1e-10)


def test_eval_depth_clips_and_crops():
    pred = np.full((1, 30, 30), 2.0)  # clipped to 1.18
    gt = np.full((1, 30, 30), 1.18)
    msk = np.ones_like(pred, bool)
    d1, d2, d3, rmse, absrel = eval_depth(pred, gt, msk, crop=5)
    assert d1 == d2 == d3 == 1.0
    assert rmse == 0.0 and absrel == 0.0
