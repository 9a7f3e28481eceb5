"""Multi-chip SCALING evidence for the DP group eval, the shard_map'd big
path, and the DP global train step (SURVEY.md section 2.2; round-4 review
item 9: correctness of these programs is equality-tested elsewhere — this
file asserts the sharding actually scales).

This host exposes 8 VIRTUAL CPU devices on one physical core, so wall-clock
cannot show a speedup here. What XLA's compiled SPMD executable does expose —
and what genuinely predicts multi-chip throughput, since each TPU runs
exactly this per-device program — is the per-device cost:
``compiled.cost_analysis()`` flops and ``memory_analysis()`` argument bytes
are PER-DEVICE quantities (verified: an 8-way data-sharded einsum reports
exactly 1/8 the flops of the single-device compile). The tests assert
>= N/2x efficiency: per-device flops at N=8 must be <= 1/4 of the N=1
program, i.e. the collectives/stitch overhead XLA inserts costs less than
half the ideal 8x parallel speedup.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurry_edges_tpu import models
from blurry_edges_tpu.config import CamConfig, GridConfig, PatchConfig
from blurry_edges_tpu.eval.pipeline import (InferenceModules,
                                            make_batched_depth_estimator)
from blurry_edges_tpu.eval.pipeline_big import make_big_depth_estimator
from blurry_edges_tpu.parallel import make_mesh, replicate, shard_batch

pytestmark = pytest.mark.slow

rng = np.random.default_rng(99)
GRID = GridConfig(H=49, W=49)
BIG = GridConfig(H=71, W=71)   # 2x2 blocks of 49x49 at margin 2
N_MARGIN = 2
N_DEV = 8
MIN_EFF = 0.5  # >= N/2x: per-device flops <= single-device / (N * MIN_EFF)


def _mods():
    key = jax.random.PRNGKey(0)
    local = models.LocalStage()
    glob = models.GlobalStage()
    return InferenceModules(
        local_model=local,
        local_vars=local.init(key, jnp.zeros((1, 21, 21, 3))),
        global_model=glob,
        global_vars=glob.init(key, jnp.zeros((1, GRID.num_tokens, 38))))


def _per_device_flops(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca["flops"])


def test_dp_group_eval_scales():
    """run_eval's --dp_devices grouping compiles to a per-device program doing
    ~1/D of the work: D image pairs sharded one-per-device over the 'data'
    mesh, params replicated (blurry_edges_tpu/eval/pipeline.py run_eval)."""
    mods = _mods()
    batch = jnp.asarray(rng.uniform(0, 1, (N_DEV, 2, GRID.H, GRID.W, 3))
                        .astype(np.float32))

    f1 = make_batched_depth_estimator(mods, PatchConfig(), GRID, CamConfig())
    c1 = f1.lower(batch).compile()

    mesh = make_mesh(N_DEV)
    sharded = shard_batch(batch, mesh)
    c8 = f1.lower(sharded).compile()

    fl1, fl8 = _per_device_flops(c1), _per_device_flops(c8)
    eff = fl1 / (fl8 * N_DEV)
    assert eff >= MIN_EFF, (fl1, fl8, eff)
    # and the sharded compile really is a multi-device executable
    assert len(c8.input_shardings[0]) >= 1
    m8 = c8.memory_analysis()
    m1 = c1.memory_analysis()
    assert m8.argument_size_in_bytes < m1.argument_size_in_bytes


def test_sharded_big_path_scales():
    """The shard_map'd block grid (make_big_depth_estimator mesh=...) must
    put ~1/N of the block compute on each device; the stitch gather is the
    only cross-device step (blurry_edges_tpu/eval/pipeline_big.py)."""
    mods = _mods()
    img = jnp.asarray(rng.uniform(0, 1, (2, BIG.H, BIG.W, 3))
                      .astype(np.float32))

    single = make_big_depth_estimator(mods, PatchConfig(), GRID, BIG,
                                      CamConfig(), N_MARGIN)
    c1 = single.lower(img).compile()

    # 2x2 blocks -> shard over 4 devices (the block axis is the mesh axis)
    n_dev = 4
    sharded = make_big_depth_estimator(mods, PatchConfig(), GRID, BIG,
                                       CamConfig(), N_MARGIN,
                                       mesh=make_mesh(n_dev))
    c4 = sharded.lower(img).compile()

    fl1, fl4 = _per_device_flops(c1), _per_device_flops(c4)
    eff = fl1 / (fl4 * n_dev)
    assert eff >= MIN_EFF, (fl1, fl4, eff)


def test_dp_global_train_step_scales():
    """The DP global-stage train step (sharded batch + replicated params,
    gradient psum over the mesh) keeps >= N/2x per-device efficiency
    including the gradient all-reduce (blurry_edges_tpu/train/global_.py,
    SURVEY.md section 5.8)."""
    from blurry_edges_tpu.config import get_args
    from blurry_edges_tpu.ops.dfd import DfDSolver
    from blurry_edges_tpu.train.global_ import (gamma_ranges_from_args,
                                                gammas_to_array, init_state,
                                                make_step_fns)
    from blurry_edges_tpu.train import schedules

    args = get_args("global_train", argv=["--batch_size", str(N_DEV)])
    patch_cfg = PatchConfig()
    dfd = DfDSolver.from_config(CamConfig(), patch_cfg)
    model = models.GlobalStage(in_parameter_size=38, out_parameter_size=12)
    key = jax.random.PRNGKey(0)
    state, tx = init_state(model, key, 1e-4, GRID.num_tokens)
    tstep, _ = make_step_fns(model, tx, patch_cfg, GRID, dfd, 1)

    L = GRID.num_tokens
    # compact device-resident batch contract (expand_compact_batch)
    batch = {
        "input_param": rng.normal(scale=0.3, size=(N_DEV, 2, L, 19))
        .astype(np.float32),
        "imgs_u8": rng.integers(0, 256, (N_DEV, 2, GRID.H, GRID.W, 3))
        .astype(np.uint8),
        "bndry_dist": rng.integers(0, 10, (N_DEV, GRID.H, GRID.W))
        .astype(np.uint16),
        "bndry_depth": np.zeros((N_DEV, GRID.H, GRID.W), np.float32),
    }
    gammas = gammas_to_array(schedules.final_gamma(gamma_ranges_from_args(args)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    f = jax.jit(tstep)
    c1 = f.lower(state, jb, gammas, key).compile()

    mesh = make_mesh(N_DEV)
    sb = shard_batch(jb, mesh)
    rstate = state.replace(params=replicate(state.params, mesh),
                           opt_state=replicate(state.opt_state, mesh))
    c8 = f.lower(rstate, sb, gammas, key).compile()

    fl1, fl8 = _per_device_flops(c1), _per_device_flops(c8)
    eff = fl1 / (fl8 * N_DEV)
    assert eff >= MIN_EFF, (fl1, fl8, eff)
