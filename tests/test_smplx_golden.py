"""Golden SMPL-X test: hand-written numpy LBS vs the jitted forward.

VERDICT round-1 item 8: replace property-only LBS coverage with a
fixture-based golden — a synthetic SMPLX-format npz (real 55-joint tree,
reduced vertex count) and an independent loop-based numpy implementation
of the full model math (blendshapes, Rodrigues, kinematic chain, skinning,
barycentric extra joints), including the reference's extra-joints yaml
(``visualise/smplx/smplx_extra_joints.yaml``) parsed in file order.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from probtalk_tpu.smplx import (
    load_smplx, smplx_forward, write_synthetic_smplx_npz,
)
from probtalk_tpu.smplx.synthetic import SMPLX_PARENTS, make_synthetic_smplx

REF_YAML = "/root/reference/visualise/smplx/smplx_extra_joints.yaml"


# ---------------------------------------------------------------------------
# independent numpy reference implementation (explicit loops, no jax)
# ---------------------------------------------------------------------------

def rodrigues(aa):
    """(3,) axis-angle -> (3, 3) rotation matrix, classic Rodrigues."""
    theta = np.linalg.norm(aa)
    if theta < 1e-12:
        return np.eye(3)
    k = aa / theta
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * kx + (1 - np.cos(theta)) * kx @ kx


def numpy_smplx(data, betas, expression, pose_aa):
    """One sample: betas (300,), expression (100,), pose (55*3,) ->
    (joints (55+E, 3), vertices (V, 3))."""
    v_template = data["v_template"].astype(np.float64)
    shapedirs = data["shapedirs"].astype(np.float64)
    posedirs = data["posedirs"].astype(np.float64)
    j_reg = data["J_regressor"].astype(np.float64)
    weights = data["weights"].astype(np.float64)
    parents = data["kintree_table"][0].copy()
    parents[0] = 0
    nj = j_reg.shape[0]

    coeffs = np.concatenate([betas, expression])
    v_shaped = v_template + shapedirs @ coeffs
    joints = j_reg @ v_shaped

    rots = np.stack([rodrigues(pose_aa[3 * k: 3 * k + 3]) for k in range(nj)])
    pose_feat = (rots[1:] - np.eye(3)).reshape(-1)              # ((J-1)*9,)
    # npz posedirs layout (V, 3, (J-1)*9)
    v_posed = v_shaped + np.einsum("vcp,p->vc", posedirs, pose_feat)

    # kinematic chain, explicit loop
    world = np.zeros((nj, 4, 4))
    for k in range(nj):
        local = np.eye(4)
        local[:3, :3] = rots[k]
        local[:3, 3] = joints[k] - (joints[parents[k]] if k else 0.0)
        world[k] = local if k == 0 else world[parents[k]] @ local
    posed_joints = world[:, :3, 3].copy()

    # remove rest-pose joint location for skinning
    rel = world.copy()
    for k in range(nj):
        rel[k, :3, 3] -= rel[k, :3, :3] @ joints[k]

    verts = np.zeros_like(v_posed)
    for v in range(v_posed.shape[0]):
        t = np.zeros((4, 4))
        for k in range(nj):
            if weights[v, k]:
                t += weights[v, k] * rel[k]
        verts[v] = t[:3, :3] @ v_posed[v] + t[:3, 3]

    # extra joints: selector picks, landmarks, yaml entries (file order)
    faces = data["f"]
    extra = [verts[data["selector_vertex_ids"]]]
    lmk_tri = verts[faces[data["lmk_faces_idx"]]]               # (51, 3, 3)
    extra.append(np.einsum("evc,ev->ec", lmk_tri,
                           data["lmk_bary_coords"].astype(np.float64)))
    if os.path.exists(REF_YAML):
        import yaml

        with open(REF_YAML) as f:
            table = yaml.safe_load(f)
        for name in table:
            tri = verts[faces[int(table[name]["face"])]]
            extra.append((np.asarray(table[name]["bc"])[:, None] * tri).sum(0)[None])
    joints_out = np.concatenate([posed_joints] + extra)
    return joints_out, verts


# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def asset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("smplx") / "SMPLX_SYNTH.npz")
    write_synthetic_smplx_npz(path, n_verts=120, n_faces=10100, seed=3)
    return path


class TestGoldenLBS:
    def test_forward_matches_numpy(self, asset):
        data = dict(np.load(asset))
        yaml_path = REF_YAML if os.path.exists(REF_YAML) else None
        model = load_smplx(asset, extra_joints_yaml=yaml_path)

        rng = np.random.default_rng(7)
        betas = 0.5 * rng.normal(size=300).astype(np.float32)
        expr = 0.5 * rng.normal(size=(2, 100)).astype(np.float32)
        pose = 0.4 * rng.normal(size=(2, 55 * 3)).astype(np.float32)

        out = smplx_forward(model, jnp.asarray(betas), jnp.asarray(expr),
                            jnp.asarray(pose), return_verts=True)
        for i in range(2):
            gj, gv = numpy_smplx(data, betas, expr[i], pose[i])
            np.testing.assert_allclose(np.asarray(out["vertices"][i]), gv,
                                       atol=2e-4)
            np.testing.assert_allclose(np.asarray(out["joints"][i]), gj,
                                       atol=2e-4)

    def test_reference_joint_layout(self, asset):
        """55 skeleton + 21 selector + 51 landmarks (+22 yaml) joints: the
        index groups of test_holisticbody.py:76,113 stay in range."""
        yaml_path = REF_YAML if os.path.exists(REF_YAML) else None
        model = load_smplx(asset, extra_joints_yaml=yaml_path)
        expect = 55 + 21 + 51 + (22 if yaml_path else 0)
        out = smplx_forward(model, jnp.zeros((300,)), jnp.zeros((1, 100)),
                            jnp.zeros((1, 165)))
        assert out["joints"].shape == (1, expect, 3)

    def test_real_tree_parents(self):
        d = make_synthetic_smplx(n_verts=60, n_faces=100)
        assert d["kintree_table"][0].tolist() == SMPLX_PARENTS.tolist()
        # hands hang off the wrists (20 left / 21 right)
        assert all(SMPLX_PARENTS[k] in (20, 25 + 3 * ((k - 25) // 3), k - 1)
                   for k in range(25, 40))
        assert SMPLX_PARENTS[22] == 15 and SMPLX_PARENTS[23] == 15
