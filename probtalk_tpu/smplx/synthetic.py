"""Synthetic SMPL-X model asset for tests / demos without the real npz.

The real SMPLX_NEUTRAL_2020.npz is a license-gated large blob the reference
also does not vendor (its `visualise/` smplx dir ships only the extra-joints
yaml). This generator writes a structurally-identical npz — same keys, same
shapes modulo a reduced vertex count, the real 55-joint kinematic tree —
so the whole joints/vertices/rendering path (``lbs.load_smplx`` +
``smplx_forward``) runs end-to-end and can be golden-tested against a
hand-written numpy LBS (tests/test_smplx_golden.py).

Reference surface reproduced: `data_utils/get_j.py:35-66` (smplx package
forward) and the 127-joint layout of `scripts/test_holisticbody.py:76,113`.
"""

from __future__ import annotations

import numpy as np

# the real SMPL-X kinematic tree (55 joints): pelvis->legs/spine/arms chain,
# jaw + eyes off the head, 15 joints per hand in index/middle/pinky/ring/
# thumb order off each wrist — the public model topology.
SMPLX_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
     18, 19, 15, 15, 15,
     20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
     21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53],
    np.int64,
)

NUM_JOINTS = 55


def make_synthetic_smplx(n_verts: int = 400, n_faces: int = 10100,
                         n_betas: int = 300, n_expr: int = 100,
                         n_landmarks: int = 51, seed: int = 0) -> dict:
    """Build the npz content dict. n_faces defaults above the max face
    index in the reference's extra-joints yaml (10093) so that table is
    usable against this fixture."""
    rng = np.random.default_rng(seed)
    j = NUM_JOINTS

    # rest skeleton: random but respecting the chain (children offset from
    # parents) so bone lengths are non-degenerate
    joints_rest = np.zeros((j, 3), np.float32)
    for k in range(1, j):
        joints_rest[k] = joints_rest[SMPLX_PARENTS[k]] + \
            0.25 * rng.normal(size=3).astype(np.float32)

    assign = rng.integers(0, j, n_verts)
    v_template = (joints_rest[assign] +
                  0.08 * rng.normal(size=(n_verts, 3))).astype(np.float32)

    j_regressor = np.zeros((j, n_verts), np.float32)
    for k in range(j):
        members = np.nonzero(assign == k)[0]
        if len(members) == 0:
            j_regressor[k, k % n_verts] = 1.0
        else:
            j_regressor[k, members] = 1.0 / len(members)

    # soft skinning weights: mostly the assigned joint, some parent blend
    lbs_weights = np.zeros((n_verts, j), np.float32)
    lbs_weights[np.arange(n_verts), assign] = 0.8
    parent_of = np.where(SMPLX_PARENTS[assign] >= 0,
                         SMPLX_PARENTS[assign], assign)
    lbs_weights[np.arange(n_verts), parent_of] += 0.2
    lbs_weights /= lbs_weights.sum(-1, keepdims=True)

    shapedirs = 0.01 * rng.normal(
        size=(n_verts, 3, n_betas + n_expr)).astype(np.float32)
    posedirs = 0.001 * rng.normal(
        size=(n_verts, 3, (j - 1) * 9)).astype(np.float32)

    faces = rng.integers(0, n_verts, size=(n_faces, 3)).astype(np.int64)
    lmk_faces_idx = rng.integers(0, n_faces, size=(n_landmarks,)).astype(np.int64)
    lmk_bc = rng.random((n_landmarks, 3)).astype(np.float32)
    lmk_bc /= lmk_bc.sum(-1, keepdims=True)
    selector_ids = rng.integers(0, n_verts, size=(21,)).astype(np.int64)

    kintree = np.stack([SMPLX_PARENTS, np.arange(j, dtype=np.int64)])
    return {
        "v_template": v_template,
        "shapedirs": shapedirs,
        "posedirs": posedirs,
        "J_regressor": j_regressor,
        "kintree_table": kintree,
        "weights": lbs_weights,
        "f": faces,
        "lmk_faces_idx": lmk_faces_idx,
        "lmk_bary_coords": lmk_bc,
        "selector_vertex_ids": selector_ids,
    }


def write_synthetic_smplx_npz(path: str, **kwargs) -> str:
    np.savez(path, **make_synthetic_smplx(**kwargs))
    return path
