"""LBS math tests on a small synthetic skeleton (no model npz needed)."""

import numpy as np
import jax.numpy as jnp
import pytest

from probtalk_tpu.smplx.lbs import SmplxModel, smplx_forward, NUM_JOINTS


def make_synthetic_model(n_verts=60, n_betas=4, n_expr=2, seed=0):
    rng = np.random.default_rng(seed)
    j = NUM_JOINTS
    # chain parents: SMPL-X-like (parent < child)
    parents = np.zeros(j, np.int32)
    for k in range(1, j):
        parents[k] = rng.integers(0, k)
    joints_rest = rng.normal(size=(j, 3)).astype(np.float32)
    # place verts near joints; regressor is a soft assignment
    assign = rng.integers(0, j, n_verts)
    v_template = joints_rest[assign] + 0.1 * rng.normal(size=(n_verts, 3)).astype(np.float32)
    j_reg = np.zeros((j, n_verts), np.float32)
    for k in range(j):
        members = np.nonzero(assign == k)[0]
        if len(members) == 0:
            j_reg[k, k % n_verts] = 1.0
        else:
            j_reg[k, members] = 1.0 / len(members)
    lbs_w = np.zeros((n_verts, j), np.float32)
    lbs_w[np.arange(n_verts), assign] = 1.0
    return SmplxModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(0.01 * rng.normal(size=(n_verts, 3, n_betas + n_expr)).astype(np.float32)),
        posedirs=jnp.asarray(np.zeros(((j - 1) * 9, n_verts * 3), np.float32)),
        j_regressor=jnp.asarray(j_reg),
        parents=jnp.asarray(parents),
        lbs_weights=jnp.asarray(lbs_w),
        faces=jnp.zeros((0, 3), jnp.int32),
        extra_joint_faces=jnp.zeros((0, 3), jnp.int32),
        extra_joint_bc=jnp.zeros((0, 3), jnp.float32),
        n_betas=n_betas,
        n_expr=n_expr,
    )


@pytest.fixture(scope="module")
def model():
    return make_synthetic_model()


def run(model, pose, betas=None, expr=None, **kw):
    b = pose.shape[0]
    betas = betas if betas is not None else jnp.zeros((model.n_betas,))
    expr = expr if expr is not None else jnp.zeros((b, model.n_expr))
    return smplx_forward(model, betas, expr, pose, **kw)


class TestLBS:
    def test_rest_pose_identity(self, model):
        pose = jnp.zeros((1, NUM_JOINTS * 3))
        out = run(model, pose, return_verts=True)
        rest_joints = np.asarray(model.j_regressor @ model.v_template)
        np.testing.assert_allclose(np.asarray(out["joints"][0]), rest_joints, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out["vertices"][0]), np.asarray(model.v_template), atol=1e-5
        )

    def test_global_rotation_rotates_rigidly(self, model):
        from scipy.spatial.transform import Rotation as R

        aa = np.array([0.3, -0.2, 0.5], np.float32)
        pose = np.zeros((1, NUM_JOINTS * 3), np.float32)
        pose[0, :3] = aa
        out = run(model, jnp.asarray(pose))
        rest_joints = np.asarray(model.j_regressor @ model.v_template)
        root = rest_joints[0]
        rot = R.from_rotvec(aa).as_matrix()
        expect = (rest_joints - root) @ rot.T + root
        np.testing.assert_allclose(np.asarray(out["joints"][0]), expect, atol=1e-4)

    def test_child_rotation_preserves_bone_lengths(self, model):
        rng = np.random.default_rng(1)
        pose = 0.3 * rng.normal(size=(2, NUM_JOINTS * 3)).astype(np.float32)
        out = run(model, jnp.asarray(pose))
        joints = np.asarray(out["joints"])
        rest_joints = np.asarray(model.j_regressor @ model.v_template)
        parents = np.asarray(model.parents)
        for k in range(1, NUM_JOINTS):
            rest_len = np.linalg.norm(rest_joints[k] - rest_joints[parents[k]])
            posed_len = np.linalg.norm(joints[:, k] - joints[:, parents[k]], axis=-1)
            np.testing.assert_allclose(posed_len, rest_len, atol=1e-4)

    def test_betas_change_shape(self, model):
        pose = jnp.zeros((1, NUM_JOINTS * 3))
        out0 = run(model, pose)
        out1 = run(model, pose, betas=jnp.ones((model.n_betas,)))
        assert not np.allclose(np.asarray(out0["joints"]), np.asarray(out1["joints"]))

    def test_jit_batch(self, model):
        import jax

        pose = jnp.zeros((6, NUM_JOINTS * 3))
        f = jax.jit(lambda p: smplx_forward(
            model, jnp.zeros((model.n_betas,)), jnp.zeros((6, model.n_expr)), p
        )["joints"])
        j = f(pose)
        assert j.shape == (6, NUM_JOINTS, 3)
