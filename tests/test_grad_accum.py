"""Gradient accumulation in the global-stage step must be EXACT: chunked
means + the sum/count depth ratio reproduce the full-batch loss and the
resulting parameter update (reference batch semantics,
global_training.py:204-213, preserved under the memory-saving scan)."""

import numpy as np
import numpy.testing as npt

import jax
import jax.flatten_util
import jax.numpy as jnp

from blurry_edges_tpu.config import CamConfig, GridConfig, PatchConfig
from blurry_edges_tpu.models import GlobalStage
from blurry_edges_tpu.ops.dfd import DfDSolver
from blurry_edges_tpu.train import global_ as tg

import pytest  # noqa: E402

pytestmark = pytest.mark.slow

rng = np.random.default_rng(21)
H = 29
GRID = GridConfig(H=H, W=H)
PATCH = PatchConfig()


def _batch(B, include_ny=True):
    L = GRID.num_tokens
    bd = np.zeros((B, H, H), np.float32)
    bd[:, ::5, :] = 0.95
    out = {
        "input_param": rng.normal(scale=0.3, size=(B, 2, L, 19)).astype(np.float32),
        "img_gt": rng.uniform(0, 1, (B, 2, H, H, 3)).astype(np.float32),
        "bndry_dist": rng.integers(0, 10, (B, H, H)).astype(np.float32),
        "deri": rng.uniform(-1, 1, (B, 2, H - 2, H - 2, 3)).astype(np.float32),
        "bndry_depth": bd,
    }
    if include_ny:
        out["img_ny"] = np.clip(
            out["img_gt"] + rng.normal(0, 0.02, out["img_gt"].shape), 0, 1
        ).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in out.items()}


def test_grad_accum_exact():
    B = 4
    dfd = DfDSolver.from_config(CamConfig(), PATCH)
    model = GlobalStage()
    state, tx = tg.init_state(model, jax.random.PRNGKey(0), 1e-4, GRID.num_tokens)
    batch = _batch(B)
    gammas = tg.gammas_to_array({k: float(g) for k, g in
                                 zip(tg.GAMMA_ORDER, rng.uniform(0.1, 1.0, 7))})

    _, eval_plain = tg.make_steps(model, tx, PATCH, GRID, dfd, grad_accum=1)
    _, eval_acc = tg.make_steps(model, tx, PATCH, GRID, dfd, grad_accum=B // 2)

    # eval (no dropout): loss must match to float noise
    v_plain = float(eval_plain(state, batch, gammas))
    v_acc = float(eval_acc(state, batch, gammas))
    npt.assert_allclose(v_acc, v_plain, rtol=1e-5)

    # exact gradient comparison with dropout off (the chunked train path
    # necessarily draws different dropout masks, so compare eval-mode grads)
    def loss_eval_mode(params, accum):
        _, eval_fn = tg.make_step_fns(model, tx, PATCH, GRID, dfd, accum)
        st = state.replace(params=params)
        return eval_fn(st, batch, gammas)

    g_plain = jax.grad(lambda p: loss_eval_mode(p, 1))(state.params)
    flat_p, _ = jax.flatten_util.ravel_pytree(g_plain)

    # chunk size 2: the decomposition is exact (an unrolled python-loop
    # version matches the full batch to 1e-7), but under lax.scan XLA
    # compiles the body standalone and fuses differently, and the eta
    # cascade (erf slopes ~1/eta with eta down to 1e-4) amplifies those
    # last-ulp differences ~1e4x in the gradient - so assert direction and
    # norm, not elementwise equality (measured norm ratio ~1e-4).
    g_acc = jax.grad(lambda p: loss_eval_mode(p, B // 2))(state.params)
    flat_a, _ = jax.flatten_util.ravel_pytree(g_acc)
    a, b = np.asarray(flat_a), np.asarray(flat_p)
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 1e-3
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999999, cos

    # chunk size 1: XLA computes batch-1 matmuls with a different algorithm
    # (measured ~2e-6 forward wiggle on the transformer), and the eta cascade
    # (10^(2 erf - 2) down to 1e-4 inside an erf slope) amplifies that by
    # ~1e4 in the gradient. The decomposition itself is exact - assert the
    # gradient direction survives (cosine) rather than elementwise equality.
    g_1 = jax.grad(lambda p: loss_eval_mode(p, B))(state.params)
    flat_1, _ = jax.flatten_util.ravel_pytree(g_1)
    a, b = np.asarray(flat_1), np.asarray(flat_p)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999, cos
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 0.05


def test_expand_compact_batch_roundtrip():
    """Compact uint8/uint16 device form losslessly reconstructs the loss
    inputs (images as photon counts, on-the-fly Sobel derivative)."""
    from blurry_edges_tpu.ops.sobel import image_derivative

    B = 2
    alphas = rng.uniform(180, 200, (B,)).astype(np.float32)
    imgs = rng.integers(0, 256, (B, 2, H, H, 3)).astype(np.float32)
    a = alphas[:, None, None, None, None]
    img_gt = (imgs / 255.0 * a).astype(np.float32)
    img_ny = np.clip(np.round(imgs / 255.0 * a + rng.normal(0, 2, imgs.shape)),
                     0, 200).astype(np.float32)

    compact = {
        "input_param": jnp.zeros((B, 2, GRID.num_tokens, 19)),
        "imgs_u8": jnp.asarray(np.round(img_gt / a * 255.0).astype(np.uint8)),
        "bndry_dist": jnp.asarray(rng.integers(0, 300, (B, H, H)).astype(np.uint16)),
        "bndry_depth": jnp.asarray(rng.uniform(0.75, 1.18, (B, H, H)).astype(np.float32)),
        "ny_u8": jnp.asarray(img_ny.astype(np.uint8)),
        "alpha": jnp.asarray(alphas),
    }
    out = tg.expand_compact_batch(compact)

    npt.assert_allclose(np.asarray(out["img_gt"]), img_gt / a, rtol=1e-6)
    npt.assert_allclose(np.asarray(out["img_ny"]), img_ny / a, rtol=1e-6)
    # deri equals the dataset's sobel(imgs)/255 with the [1:-1] crop
    expect_deri = np.asarray(image_derivative(
        jnp.asarray(imgs.reshape(B * 2, H, H, 3) / 255.0))).reshape(
        B, 2, H - 2, H - 2, 3)
    npt.assert_allclose(np.asarray(out["deri"]), expect_deri, rtol=1e-5, atol=1e-6)
    npt.assert_array_equal(np.asarray(out["bndry_dist"]),
                           np.asarray(compact["bndry_dist"], np.float32))
