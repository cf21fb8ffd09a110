"""Tests for core.body_parts index algebra against the documented reference
semantics (data_utils/lower_body.py, nets/base.py)."""

import numpy as np
import jax.numpy as jnp

from probtalk_tpu.core import body_parts as bp
from probtalk_tpu.core import normalize as nrm


class TestIndices:
    def test_counts(self):
        assert bp.C_INDEX_3D.shape[0] == 135
        assert bp.C_INDEX_6D.shape[0] == 270
        assert bp.FIX_INDEX_3D.shape[0] == 30
        # disjoint and covering
        assert len(np.intersect1d(bp.C_INDEX_3D, bp.FIX_INDEX_3D)) == 0
        assert len(np.union1d(bp.C_INDEX_3D, bp.FIX_INDEX_3D)) == 165

    def test_6d_doubles_3d(self):
        np.testing.assert_array_equal(bp.C_INDEX_6D[0::2], 2 * bp.C_INDEX_3D)
        np.testing.assert_array_equal(bp.C_INDEX_6D[1::2], 2 * bp.C_INDEX_3D + 1)

    def test_dims(self):
        assert bp.each_dim(True) == [6, 90, 180, 100]
        assert bp.each_dim(False) == [3, 45, 90, 100]
        assert bp.full_dim(True) == 376
        assert bp.full_dim(False) == 238
        assert bp.dim_list(True) == [0, 6, 6, 96, 276]


class TestComposeFbhe:
    def test_shapes_and_content(self, rng):
        poses = rng.normal(size=(2, 10, 330)).astype(np.float32)
        expr = rng.normal(size=(2, 10, 100)).astype(np.float32)
        fbhe = np.asarray(bp.compose_fbhe(jnp.asarray(poses), jnp.asarray(expr)))
        assert fbhe.shape == (2, 10, 376)
        np.testing.assert_array_equal(fbhe[..., :6], poses[..., :6])
        np.testing.assert_array_equal(fbhe[..., 6:276], poses[..., bp.C_INDEX_6D])
        np.testing.assert_array_equal(fbhe[..., 276:], expr)


class TestLowerBodySplicing:
    def test_part2full_shape(self, rng):
        # modelled channels in 3d: 135 + expression appended downstream;
        # part2full operates on [jaw3, go3, body3, rest...] = 9 + N
        x = rng.normal(size=(5, 138)).astype(np.float32)  # 135 modelled + 3 jaw... 138 arbitrary
        full = np.asarray(bp.part2full(jnp.asarray(x)))
        assert full.shape == (5, 138 + 27)

    def test_part2full_places_lower_pose(self, rng):
        x = np.zeros((1, 135), dtype=np.float32)
        full = np.asarray(bp.part2full(jnp.asarray(x), stand=False))
        lp = bp.LOWER_POSE_SIT
        np.testing.assert_array_equal(full[0, 3:18], lp[:15])
        np.testing.assert_array_equal(full[0, 21:27], lp[15:21])
        np.testing.assert_array_equal(full[0, 30:36], lp[21:27])

    def test_part2full_stand_zeroes_most(self):
        x = np.zeros((1, 135), dtype=np.float32)
        full = np.asarray(bp.part2full(jnp.asarray(x), stand=True))
        np.testing.assert_array_equal(full[0, 9:12], np.float32([3.0747, -0.0158, -0.0152]))
        assert np.all(full[0, 3:9] == 0)

    def test_poses2pred_roundtrip_with_part2full(self, rng):
        # poses2pred(full) should equal part2full(channels-selected full)
        full = rng.normal(size=(3, 165)).astype(np.float32)
        a = np.asarray(bp.poses2pred(jnp.asarray(full)))
        sel = np.concatenate([full[:, :3], full[:, 18:21], full[:, 27:30], full[:, 36:]], -1)
        b = np.asarray(bp.part2full(jnp.asarray(sel)))
        np.testing.assert_allclose(a, b, atol=0)

    def test_pred2poses_takes_gt_lower(self, rng):
        x = rng.normal(size=(2, 135)).astype(np.float32)
        gt = rng.normal(size=(2, 165)).astype(np.float32)
        out = np.asarray(bp.pred2poses(jnp.asarray(x), jnp.asarray(gt)))
        np.testing.assert_array_equal(out[:, 3:18], gt[:, 3:18])
        np.testing.assert_array_equal(out[:, 21:27], gt[:, 21:27])
        np.testing.assert_array_equal(out[:, :3], x[:, :3])


class TestNormalize:
    def test_roundtrip_all(self, rng):
        x = rng.normal(size=(2, 7, 430)).astype(np.float32)
        mean = rng.normal(size=(430,)).astype(np.float32)
        std = rng.uniform(0.5, 2.0, size=(430,)).astype(np.float32)
        z = nrm.normalize(jnp.asarray(x), mean, std)
        back = np.asarray(nrm.denormalize(z, mean, std))
        np.testing.assert_allclose(back, x, atol=1e-5)

    def test_fbhe_reindex(self, rng):
        # stats over 430 channels (330 pose + 100 expr) reindexed to 376
        mean = rng.normal(size=(430,)).astype(np.float32)
        std = rng.uniform(0.5, 2.0, size=(430,)).astype(np.float32)
        x = rng.normal(size=(1, 4, 376)).astype(np.float32)
        out = np.asarray(
            nrm.denormalize(jnp.asarray(x), mean, std, shape="fbhe", idx=bp.C_INDEX_6D)
        )
        expect_mean = np.concatenate([mean[:6], mean[bp.C_INDEX_6D], mean[-100:]])
        expect_std = np.concatenate([std[:6], std[bp.C_INDEX_6D], std[-100:]])
        np.testing.assert_allclose(out, x * expect_std + expect_mean, rtol=1e-5)
