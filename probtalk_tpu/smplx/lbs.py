"""SMPL-X linear blend skinning as a jit-compiled device-side forward.

Capability of the external ``smplx`` pip package the reference drives from
host loops (``data_utils/get_j.py:35-66`` micro-batches SMPL-X forwards on
4-frame chunks). Here the whole (B, T) batch of poses runs as one fused XLA
computation: shape/expression blendshapes and skinning are single matmuls
on the MXU, the kinematic-chain composition is a ``lax.scan`` over the 55
joints, and nothing leaves HBM between motion generation and joint-based
evaluation.

Implements the standard SMPL-X model math (Pavlakos et al., CVPR 2019):
  v_shaped = T + S.[betas; psi]          (shape + expression blendshapes)
  J = J_regressor . v_shaped
  v_posed  = v_shaped + P.(R - I)        (pose-corrective blendshapes)
  G_k      = prod along kintree of [R_k | t_k]
  v        = sum_k w_k G'_k v_posed      (linear blend skinning)

Model data loads from the standard SMPLX_*.npz release file (not vendored
here — a large-blob asset). Extra surface landmarks (head/ears/toes etc.)
are regressed barycentrically from the template faces using the same
landmark table the reference ships (``visualise/smplx/smplx_extra_joints.yaml``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from probtalk_tpu.core.rotation import axis_angle_to_matrix

NUM_JOINTS = 55          # pelvis + 21 body + jaw + 2 eyes + 30 hand joints
NUM_BODY_JOINTS = 21

# Canonical SMPL-X surface-keypoint vertex ids (the public `vertex_ids`
# table of the smplx package), in the order the package's
# VertexJointSelector appends them after the 55 skeleton joints:
# [nose, reye, leye, rear, lear | L/R big toe, small toe, heel | left
# thumb/index/middle/ring/pinky tips | right tips]. With the 51 facial
# landmarks regressed from the model npz's lmk tables this reproduces the
# 127-joint layout every index-based metric of the reference assumes
# (scripts/test_holisticbody.py:76,113: jaw=22, body=0..21, face=74:127).
SELECTOR_VERTEX_IDS = np.array(
    [9120, 9929, 9448, 616, 6,
     5770, 5780, 8846, 8463, 8474, 8635,
     5361, 4933, 5058, 5169, 5286,
     8079, 7669, 7794, 7905, 8022],
    np.int32,
)
SMPLX_NUM_VERTS = 10475

# joint-index groups used by the evaluation harness (reference
# test_holisticbody.py:76,113)
BODY_JOINT_IND = np.arange(0, 22)
FULL_JOINT_IND = np.concatenate([np.arange(0, 22), np.arange(23, 74)])
FACE_JOINT_IND = np.concatenate([np.arange(22, 23), np.arange(74, 127)])


class SmplxModel(NamedTuple):
    """Static SMPL-X model tensors (device constants under jit)."""

    v_template: jnp.ndarray    # (V, 3)
    shapedirs: jnp.ndarray     # (V, 3, n_betas + n_expr)
    posedirs: jnp.ndarray      # ((J-1)*9, V*3)
    j_regressor: jnp.ndarray   # (J, V)
    parents: jnp.ndarray       # (J,) int32
    lbs_weights: jnp.ndarray   # (V, J)
    faces: jnp.ndarray         # (F, 3) int32
    extra_joint_faces: jnp.ndarray  # (E, 3) int32 vertex ids (or empty)
    extra_joint_bc: jnp.ndarray     # (E, 3) barycentric weights
    n_betas: int
    n_expr: int


def load_smplx(npz_path: str, extra_joints_yaml: Optional[str] = None,
               n_betas: int = 300, n_expr: int = 100) -> SmplxModel:
    """Load an SMPLX_*.npz release file into device arrays."""
    data = np.load(npz_path, allow_pickle=True)
    shapedirs = np.asarray(data["shapedirs"], np.float32)
    n_shape_total = shapedirs.shape[-1]
    # released layout: [300 shape | 100 expression]
    shape_slice = shapedirs[..., :n_betas]
    expr_slice = shapedirs[..., 300: 300 + n_expr] if n_shape_total > 300 else \
        shapedirs[..., n_betas:]
    shapedirs = np.concatenate([shape_slice, expr_slice], axis=-1)

    posedirs = np.asarray(data["posedirs"], np.float32)
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # ((J-1)*9, V*3)

    # Extra joints appended after the 55 skeleton joints, each expressed as
    # a barycentric combination of one triangle's vertices. Assembled in
    # the reference's joint order: [21 surface keypoints | 51 facial
    # landmarks | extra-joints-yaml entries], so harness joint indices
    # (jaw=22, face=74:127) line up with scripts/test_holisticbody.py.
    faces_arr = np.asarray(data["f"], np.int64)
    ef_list, ebc_list = [], []

    sel_ids = None
    if "selector_vertex_ids" in data:           # synthetic fixtures
        sel_ids = np.asarray(data["selector_vertex_ids"], np.int64)
    elif data["v_template"].shape[0] == SMPLX_NUM_VERTS:
        sel_ids = SELECTOR_VERTEX_IDS.astype(np.int64)
    if sel_ids is not None:
        # a plain vertex pick is a degenerate barycentric (v, v, v)@(1,0,0)
        ef_list.append(np.stack([sel_ids] * 3, axis=1))
        bc = np.zeros((len(sel_ids), 3), np.float32)
        bc[:, 0] = 1.0
        ebc_list.append(bc)

    if "lmk_faces_idx" in data:                 # 51 facial landmarks
        lmk_faces = np.asarray(data["lmk_faces_idx"], np.int64).reshape(-1)
        ef_list.append(faces_arr[lmk_faces])
        ebc_list.append(np.asarray(data["lmk_bary_coords"],
                                   np.float32).reshape(-1, 3))

    if extra_joints_yaml is not None:
        import yaml

        with open(extra_joints_yaml) as f:
            table = yaml.safe_load(f)
        # file order (TalkSHOW's JointsFromVerticesSelector reads the yaml
        # in insertion order; these land past index 126, unused by metrics)
        for name in table:
            ef_list.append(faces_arr[int(table[name]["face"])][None])
            ebc_list.append(np.asarray(table[name]["bc"],
                                       np.float32).reshape(1, 3))

    if ef_list:
        extra_faces = np.concatenate(ef_list).astype(np.int32)
        extra_bc = np.concatenate(ebc_list).astype(np.float32)
    else:
        extra_faces = np.zeros((0, 3), np.int32)
        extra_bc = np.zeros((0, 3), np.float32)

    return SmplxModel(
        v_template=jnp.asarray(data["v_template"], jnp.float32),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(data["J_regressor"], jnp.float32),
        parents=jnp.asarray(np.asarray(data["kintree_table"][0], np.int64).clip(0),
                            jnp.int32),
        lbs_weights=jnp.asarray(data["weights"], jnp.float32),
        faces=jnp.asarray(np.asarray(data["f"], np.int64), jnp.int32),
        extra_joint_faces=jnp.asarray(extra_faces),
        extra_joint_bc=jnp.asarray(extra_bc),
        n_betas=n_betas,
        n_expr=n_expr,
    )


def _rigid_transform(rot_mats, joints, parents):
    """Compose world transforms down the kinematic chain.

    rot_mats: (B, J, 3, 3); joints: (B, J, 3). Returns (posed_joints (B,J,3),
    rel_transforms (B,J,4,4)). lax.scan over the 55-joint chain — the only
    sequential dependency in the model.
    """
    b, j, _, _ = rot_mats.shape
    rel_pos = joints.at[:, 1:].add(-joints[:, parents[1:]])
    # local homogeneous transforms (B, J, 4, 4)
    local = jnp.zeros((b, j, 4, 4))
    local = local.at[:, :, :3, :3].set(rot_mats)
    local = local.at[:, :, :3, 3].set(rel_pos)
    local = local.at[:, :, 3, 3].set(1.0)

    # scan joint-by-joint: parents[k] < k guaranteed by SMPL-X ordering
    def body(carry, x):
        world = carry  # (B, J, 4, 4) accumulated
        k, parent = x
        wk = jnp.einsum("bij,bjk->bik", world[:, parent], local[:, k])
        world = world.at[:, k].set(wk)
        return world, None

    world0 = jnp.tile(jnp.eye(4)[None, None], (b, j, 1, 1))
    world0 = world0.at[:, 0].set(local[:, 0])
    ks = jnp.arange(1, j, dtype=jnp.int32)
    world, _ = jax.lax.scan(body, world0, (ks, parents[1:]))

    posed_joints = world[:, :, :3, 3]
    # subtract skeleton-space joint positions for skinning
    correction = jnp.einsum("bjik,bjk->bji", world[:, :, :3, :3], joints)
    rel = world.at[:, :, :3, 3].add(-correction)
    return posed_joints, rel


def smplx_forward(model: SmplxModel, betas, expression, full_pose_aa,
                  return_verts: bool = False):
    """Batched SMPL-X forward.

    betas: (n_betas,) or (B, n_betas); expression: (B, n_expr);
    full_pose_aa: (B, 55*3) axis-angle in SMPL-X joint order
    [global_orient | body(21) | jaw | leye | reye | lhand(15) | rhand(15)].

    Returns dict with 'joints' (B, 55+E, 3) and optionally 'vertices'.
    """
    b = full_pose_aa.shape[0]
    if betas.ndim == 1:
        betas = jnp.broadcast_to(betas, (b,) + betas.shape)

    # f32 accumulation: joint positions feed evaluation metrics, so the
    # TPU's default bf16 matmul inputs are not acceptable here
    hi = jax.lax.Precision.HIGHEST
    shape_coeffs = jnp.concatenate([betas, expression], axis=-1)  # (B, nb+ne)
    v_shaped = model.v_template[None] + jnp.einsum(
        "vcs,bs->bvc", model.shapedirs, shape_coeffs, precision=hi
    )
    joints = jnp.einsum("jv,bvc->bjc", model.j_regressor, v_shaped, precision=hi)

    rot_mats = axis_angle_to_matrix(full_pose_aa.reshape(b, NUM_JOINTS, 3))
    pose_feature = (rot_mats[:, 1:] - jnp.eye(3)[None, None]).reshape(b, -1)
    v_posed = v_shaped + jnp.einsum(
        "pm,bp->bm", model.posedirs, pose_feature, precision=hi
    ).reshape(b, -1, 3)

    posed_joints, rel = _rigid_transform(rot_mats, joints, model.parents)

    out = {"joints": posed_joints}
    need_verts = return_verts or model.extra_joint_faces.shape[0] > 0
    if need_verts:
        # skinning: per-vertex transform = sum_j w_vj rel_j
        t_verts = jnp.einsum("vj,bjik->bvik", model.lbs_weights, rel, precision=hi)
        v_hom = jnp.concatenate([v_posed, jnp.ones((b, v_posed.shape[1], 1))], -1)
        verts = jnp.einsum("bvik,bvk->bvi", t_verts[:, :, :3, :], v_hom,
                           precision=hi)
        if return_verts:
            out["vertices"] = verts
        if model.extra_joint_faces.shape[0] > 0:
            tri = verts[:, model.extra_joint_faces]          # (B, E, 3, 3)
            extra = jnp.einsum("bevc,ev->bec", tri, model.extra_joint_bc)
            out["joints"] = jnp.concatenate([posed_joints, extra], axis=1)
    return out


def smplx_joints(model: SmplxModel, betas, pred, n_expr: int = 100):
    """The reference's ``get_joints`` surface (``data_utils/get_j.py:49-66``)
    on device: pred (B, T, 165 + n_expr) in the DATASET channel order
    [jaw | leye | reye | global_orient | body | lhand | rhand | expression]
    -> joints (B, T, J, 3)."""
    b, t, _ = pred.shape
    flat = pred.reshape(b * t, -1)
    jaw, leye, reye = flat[:, 0:3], flat[:, 3:6], flat[:, 6:9]
    go, body = flat[:, 9:12], flat[:, 12:75]
    lhand, rhand = flat[:, 75:120], flat[:, 120:165]
    expression = flat[:, 165: 165 + n_expr]
    # SMPL-X native joint order
    full_pose = jnp.concatenate([go, body, jaw, leye, reye, lhand, rhand], -1)
    joints = smplx_forward(model, betas, expression, full_pose)["joints"]
    return joints.reshape(b, t, -1, 3)
