"""Golden and property tests for core.rotation.

Oracle: scipy.spatial.transform.Rotation (an implementation independent of
both this repo and the PyTorch reference).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from probtalk_tpu.core import rotation as rot


def random_rotvecs(rng, n=64, max_angle=np.pi * 0.999):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return axes * angles


class TestAxisAngleMatrix:
    def test_matches_scipy(self, rng):
        aa = random_rotvecs(rng)
        ours = np.asarray(rot.axis_angle_to_matrix(aa))
        scipys = R.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(ours, scipys, atol=1e-5)

    def test_roundtrip(self, rng):
        aa = random_rotvecs(rng)
        back = np.asarray(rot.matrix_to_axis_angle(rot.axis_angle_to_matrix(aa)))
        np.testing.assert_allclose(back, aa, atol=1e-4)

    def test_small_angles(self):
        aa = np.array([[0.0, 0.0, 0.0], [1e-8, 0, 0], [0, 1e-5, 0], [1e-4, 1e-4, 1e-4]])
        m = np.asarray(rot.axis_angle_to_matrix(aa))
        np.testing.assert_allclose(m, R.from_rotvec(aa).as_matrix(), atol=1e-6)
        back = np.asarray(rot.matrix_to_axis_angle(m))
        assert np.all(np.isfinite(back))
        np.testing.assert_allclose(back, aa, atol=1e-5)


class TestQuaternion:
    def test_quat_to_matrix_matches_scipy(self, rng):
        aa = random_rotvecs(rng)
        q_scipy = R.from_rotvec(aa).as_quat()  # xyzw
        q_wxyz = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=-1)
        ours = np.asarray(rot.quaternion_to_matrix(q_wxyz))
        np.testing.assert_allclose(ours, R.from_rotvec(aa).as_matrix(), atol=1e-5)

    def test_matrix_to_quat_roundtrip(self, rng):
        aa = random_rotvecs(rng)
        m = R.from_rotvec(aa).as_matrix()
        q = np.asarray(rot.matrix_to_quaternion(m))
        m2 = np.asarray(rot.quaternion_to_matrix(q))
        np.testing.assert_allclose(m2, m, atol=1e-5)
        # w >= 0 canonical form
        assert np.all(q[:, 0] >= 0)


class TestRotation6d:
    def test_roundtrip_from_matrix(self, rng):
        aa = random_rotvecs(rng)
        m = R.from_rotvec(aa).as_matrix()
        d6 = np.asarray(rot.matrix_to_rotation_6d(m))
        assert d6.shape == (len(aa), 6)
        # first two rows flattened
        np.testing.assert_allclose(d6, m[:, :2, :].reshape(-1, 6), atol=1e-6)
        m2 = np.asarray(rot.rotation_6d_to_matrix(d6))
        np.testing.assert_allclose(m2, m, atol=1e-5)

    def test_gram_schmidt_projects_noise(self, rng):
        d6 = rng.normal(size=(32, 6)).astype(np.float32)
        m = np.asarray(rot.rotation_6d_to_matrix(d6))
        eye = np.einsum("bij,bkj->bik", m, m)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        det = np.linalg.det(m)
        np.testing.assert_allclose(det, 1.0, atol=1e-5)

    def test_flat_packed_roundtrip(self, rng):
        aa_flat = random_rotvecs(rng, n=55 * 4).reshape(4, 55 * 3)
        d6 = rot.aa_to_6d_flat(aa_flat)
        assert d6.shape == (4, 330)
        back = np.asarray(rot.d6_to_aa_flat(d6))
        np.testing.assert_allclose(back, aa_flat, atol=1e-4)


class TestJit:
    def test_jit_and_grad(self, rng):
        import jax

        aa = jnp.asarray(random_rotvecs(rng, 8))
        f = jax.jit(lambda x: rot.matrix_to_rotation_6d(rot.axis_angle_to_matrix(x)).sum())
        g = jax.grad(f)(aa)
        assert g.shape == aa.shape
        assert bool(jnp.all(jnp.isfinite(g)))
