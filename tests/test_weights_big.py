"""Resolution order of the big-path global-stage weights.

The 587x587 block-tiled pipeline prefers a dedicated checkpoint
(``pretrained_global_stage_big`` / ``best_run_exp_global_stage_big``) over the
shared stage, mirroring the reference's per-mode w weights
(reference blurry_edges_test.py:186-191); with no big checkpoint present it
must fall back to the shared stage.  Exercised against tiny synthetic orbax
checkpoints so the test does not depend on the committed trained weights.
"""

import jax
import jax.numpy as jnp
import pytest

from blurry_edges_tpu.models import GlobalStage
from blurry_edges_tpu.train.checkpoint import save_checkpoint
from blurry_edges_tpu.utils.weights import _load_stage


def _stage_vars(scale):
    key = jax.random.PRNGKey(0)
    v = GlobalStage().init(key, jnp.zeros((1, 16, 38)))
    return jax.tree.map(lambda x: x * 0 + scale, v)


@pytest.fixture(scope="module")
def ckpt_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("weights_big")
    save_checkpoint(str(root / "best_run_exp_global_stage"), _stage_vars(1.0))
    save_checkpoint(str(root / "best_run_exp_global_stage_big"), _stage_vars(2.0))
    return root


def _first_leaf(tree):
    return float(jax.tree_util.tree_leaves(tree)[0].reshape(-1)[0])


BIG_NAMES = ("pretrained_global_stage_big", "best_run_exp_global_stage_big",
             "pretrained_global_stage", "best_run_exp_global_stage")


def test_big_names_prefer_dedicated_checkpoint(ckpt_root):
    got = _load_stage(str(ckpt_root), BIG_NAMES, convert_fn=None,
                      init_fn=None, allow_random=False)
    assert _first_leaf(got) == 2.0


def test_big_names_fall_back_to_shared(ckpt_root, tmp_path):
    import shutil

    shutil.copytree(ckpt_root / "best_run_exp_global_stage",
                    tmp_path / "best_run_exp_global_stage")
    got = _load_stage(str(tmp_path), BIG_NAMES, convert_fn=None,
                      init_fn=None, allow_random=False)
    assert _first_leaf(got) == 1.0


def test_shared_names_never_pick_big(ckpt_root):
    got = _load_stage(str(ckpt_root),
                      ("pretrained_global_stage", "best_run_exp_global_stage"),
                      convert_fn=None, init_fn=None, allow_random=False)
    assert _first_leaf(got) == 1.0
