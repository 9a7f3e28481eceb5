"""The big-path margin-discard stitch maps must reproduce the reference's
sequential block-overwrite bookkeeping (reference
blurry_edges_test_big.py:166-183) exactly."""

import numpy as np
import numpy.testing as npt

from blurry_edges_tpu.eval.pipeline_big import block_geometry, stitch_maps


def reference_assignment(Hp_local, Hp_big, n_blocks, n):
    """Direct transliteration of the reference's index writes, used as spec."""
    src_block = -np.ones(Hp_big, dtype=int)
    src_local = -np.ones(Hp_big, dtype=int)
    for i_v in range(n_blocks):
        v_s = 1 if i_v == 0 else 0
        v_e = 1 if i_v == n_blocks - 1 else 0
        V_s = i_v * (Hp_local - 2 * n) + (1 - v_s) * n
        V_e = (i_v + 1) * (Hp_local - 2 * n) + (1 + v_e) * n
        V_s_l = (1 - v_s) * n
        V_e_l = (v_e - 1) * n + Hp_local
        src_block[V_s:V_e] = i_v
        src_local[V_s:V_e] = np.arange(V_s_l, V_e_l)
    return src_block, src_local


def test_block_geometry_587():
    # reference defaults: 147x147 blocks over 587x587, margin 10
    (bs0, bs1), (nb0, nb1) = block_geometry([147, 147], [587, 587], 21, 2, 10)
    assert (bs0, bs1) == (88, 88)
    assert (nb0, nb1) == (6, 6)
    assert (nb0 - 1) * bs0 + 147 == 587  # exact tiling


def test_stitch_maps_587():
    Hp_local = (147 - 21) // 2 + 1  # 64
    Hp_big = (587 - 21) // 2 + 1    # 284
    ours_b, ours_l = stitch_maps(Hp_local, Hp_big, 6, 10)
    ref_b, ref_l = reference_assignment(Hp_local, Hp_big, 6, 10)
    assert (ref_b >= 0).all(), "reference leaves no gaps"
    npt.assert_array_equal(ours_b, ref_b)
    npt.assert_array_equal(ours_l, ref_l)


def test_stitch_maps_small():
    # a smaller exact-tiling size (147 + 88k): 323 -> 3 blocks
    (bs0, _), (nb0, _) = block_geometry([147, 147], [323, 323], 21, 2, 10)
    Hp_local = 64
    Hp_big = (323 - 21) // 2 + 1
    assert (nb0 - 1) * bs0 + 147 == 323
    ours_b, ours_l = stitch_maps(Hp_local, Hp_big, nb0, 10)
    ref_b, ref_l = reference_assignment(Hp_local, Hp_big, nb0, 10)
    npt.assert_array_equal(ours_b, ref_b)
    npt.assert_array_equal(ours_l, ref_l)
