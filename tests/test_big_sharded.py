"""Multi-device block sharding of the big-image path: the shard_map'd block
grid must produce the same global maps as the single-device lax.map
(reference serial double loop, blurry_edges_test_big.py:142-183, scaled per
SURVEY.md sections 2.2 / 5.8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurry_edges_tpu import models
from blurry_edges_tpu.config import CamConfig, GridConfig, PatchConfig
from blurry_edges_tpu.eval.pipeline import InferenceModules
from blurry_edges_tpu.eval.pipeline_big import make_big_depth_estimator
from blurry_edges_tpu.parallel import make_mesh

pytestmark = pytest.mark.slow

rng = np.random.default_rng(31)

# reduced geometry: 49x49 blocks with 2-patch margins over a 71x71 image
# -> block_stride 22, 2x2 blocks, 26x26 big patch grid
BLOCK = GridConfig(H=49, W=49)
BIG = GridConfig(H=71, W=71)
N_MARGIN = 2


def _mods():
    key = jax.random.PRNGKey(0)
    local = models.LocalStage()
    glob = models.GlobalStage()
    return InferenceModules(
        local_model=local, local_vars=local.init(key, jnp.zeros((1, 21, 21, 3))),
        global_model=glob,
        global_vars=glob.init(key, jnp.zeros((1, BLOCK.num_tokens, 38))))


@pytest.mark.slow
def test_sharded_blocks_match_single_device():
    mods = _mods()
    img = jnp.asarray(rng.uniform(0, 1, (2, BIG.H, BIG.W, 3)).astype(np.float32))

    single = make_big_depth_estimator(mods, PatchConfig(), BLOCK, BIG,
                                      CamConfig(), N_MARGIN)
    sharded = make_big_depth_estimator(mods, PatchConfig(), BLOCK, BIG,
                                       CamConfig(), N_MARGIN,
                                       mesh=make_mesh(8))
    out_s = single(img)
    out_m = sharded(img)
    for k in out_s:
        a = np.asarray(out_s[k], np.float32)
        b = np.asarray(out_m[k], np.float32)
        # identical math per block; only reduction-order noise may differ,
        # which the eta cascade can amplify on isolated pixels
        d = np.abs(a - b)
        assert np.quantile(d, 0.999) < 1e-4, (k, np.quantile(d, 0.999))
        assert np.mean(d > 0.01) < 0.001, (k, np.mean(d > 0.01))
