"""Native threaded batch-gather kernel + prefetch loader."""

import numpy as np
import numpy.testing as npt

from blurry_edges_tpu.data import native

rng = np.random.default_rng(13)


def test_native_builds():
    assert native.native_available(), "g++ toolchain present; native build must succeed"


def test_gather_rows_matches_numpy():
    src = rng.normal(size=(100, 7, 5)).astype(np.float32)
    idx = rng.integers(0, 100, size=32)
    npt.assert_array_equal(native.gather_rows(src, idx), src[idx])
    # non-float dtype path
    src_i = rng.integers(0, 1000, size=(50, 9)).astype(np.int32)
    npt.assert_array_equal(native.gather_rows(src_i, idx % 50), src_i[idx % 50])


def test_gather_rows_scaled_matches_numpy():
    src = rng.normal(size=(60, 4, 4, 3)).astype(np.float32)
    alpha = rng.uniform(180, 200, size=60).astype(np.float32)
    idx = rng.integers(0, 60, size=16)
    expected = src[idx] / alpha[idx][:, None, None, None]
    npt.assert_allclose(native.gather_rows_scaled(src, idx, alpha), expected,
                        rtol=1e-6)


def test_prefetch_loader_order_and_content():
    n, B = 30, 8
    data = rng.normal(size=(n, 6)).astype(np.float32)
    alpha = rng.uniform(1, 2, size=n).astype(np.float32)
    order = rng.permutation(n)
    loader = native.PrefetchLoader(
        arrays={"x": (data, True), "raw": (data, False)},
        alpha=alpha, order=order, batch_size=B)
    batches = list(loader)
    assert len(batches) == n // B == len(loader)
    for b, batch in enumerate(batches):
        idx = order[b * B:(b + 1) * B]
        npt.assert_allclose(batch["x"], data[idx] / alpha[idx][:, None], rtol=1e-6)
        npt.assert_array_equal(batch["raw"], data[idx])
