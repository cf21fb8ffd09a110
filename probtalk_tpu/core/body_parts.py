"""SMPL-X body-part index algebra and lower-body composition.

Rebuilds the capabilities of the reference's ``data_utils/lower_body.py`` and
the dim bookkeeping of ``nets/base.py:69-100`` as pure, layout-explicit
functions. Index maps are precomputed numpy constants (static under jit).

The holistic pose vector layout (axis-angle, 55 SMPL-X joints x 3 = 165
channels; x2 for the 6d representation):

  [ jaw(3) | leye(3) | reye(3) | global_orient(3) | body(21x3) | lhand(15x3)
    | rhand(15x3) ]  -- per data_utils/mesh_dataset ordering

The generator only models the upper body: 10 of the 55 joints (lower body:
pelvis-adjacent leg/foot chain) are frozen to a canned sitting or standing
pose. ``c_index_*`` selects the modelled channels; ``part2full`` splices the
canned lower body back in.

Numeric constants (the canned lower-body poses) are data fixtures carried
over from the reference (``data_utils/lower_body.py:4-15``) — they encode
the SHOW dataset's seated/standing rest pose, not code.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# --------------------------------------------------------------------------
# dataset / model constants
# --------------------------------------------------------------------------

SPEAKER_ID = {"oliver": 0, "chemistry": 1, "seth": 2, "conan": 3}
NUM_SPEAKERS = 4

EXPRESSION_DIM = 100
BETAS_DIM = 300
NUM_JOINTS = 55          # SMPL-X joints carried in the pose vector
POSE_DIM_3D = NUM_JOINTS * 3   # 165
POSE_DIM_6D = NUM_JOINTS * 6   # 330

# channels (in the 165-d 3d layout) that belong to the frozen lower body
# (reference: data_utils/lower_body.py:43-45)
FIX_INDEX_3D = np.array(
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17,
     21, 22, 23, 24, 25, 26,
     30, 31, 32, 33, 34, 35],
    dtype=np.int32,
)

_mask3 = np.ones(POSE_DIM_3D, dtype=bool)
_mask3[FIX_INDEX_3D] = False
C_INDEX_3D = np.nonzero(_mask3)[0].astype(np.int32)            # 135 channels
C_INDEX_6D = np.stack([2 * C_INDEX_3D, 2 * C_INDEX_3D + 1], 1).reshape(-1)  # 270

# canned lower-body axis-angle poses (27 values: 9 lower-body joints x 3)
# data fixture from data_utils/lower_body.py:4-15
LOWER_POSE_SIT = np.array(
    [0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
     3.0747, -0.0158, -0.0152,
     -1.1826512813568115, 0.23866955935955048, 0.15146760642528534,
     -1.2604516744613647, -0.3160211145877838, -0.1603458970785141,
     1.1654603481292725, 0.0, 0.0,
     1.2521806955337524, 0.041598282754421234, -0.06312154978513718,
     0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    dtype=np.float32,
)
LOWER_POSE_STAND = np.array(
    [8.9759e-04, 7.1074e-04, -5.9163e-06, 8.9759e-04, 7.1074e-04, -5.9163e-06,
     3.0747, -0.0158, -0.0152,
     -3.6665e-01, -8.8455e-03, 1.6113e-01, -3.6665e-01, -8.8455e-03, 1.6113e-01,
     -3.9716e-01, -4.0229e-02, -1.2637e-01,
     7.9163e-01, 6.8519e-02, -1.5091e-01, 7.9163e-01, 6.8519e-02, -1.5091e-01,
     7.8632e-01, -4.3810e-02, 1.4375e-02],
    dtype=np.float32,
)


def each_dim(convert_to_6d: bool = True) -> list:
    """[jaw, eye+body, hand, expression] channel counts.

    Mirrors nets/base.py:69-100: with 6d, jaw=6, body=90 (global orient and
    eyes excluded -> 45 joints*... ), hands=180, expression=100.
    """
    scale = 2 if convert_to_6d else 1
    jaw = 3 * scale
    body = 45 * scale          # global_orient(0) + body_pose(45*scale)
    hand = 90 * scale          # left 45 + right 45 (in 3d), x scale
    return [jaw, body, hand, EXPRESSION_DIM]


def full_dim(convert_to_6d: bool = True) -> int:
    """Total 'fbhe' channel count: 376 in 6d mode, 238 in 3d mode."""
    return sum(each_dim(convert_to_6d))


def dim_list(convert_to_6d: bool = True) -> list:
    """Cumulative boundaries [b_jaw, b_eye, b_body, b_hand, b_face]."""
    jaw, body, hand, face = each_dim(convert_to_6d)
    b_j = 0
    b_e = b_j + jaw
    b_b = b_e + 0          # eye dim folded into body slot (always 0 here)
    b_h = b_b + body
    b_f = b_h + hand
    return [b_j, b_e, b_b, b_h, b_f]


def c_index(convert_to_6d: bool = True) -> np.ndarray:
    return C_INDEX_6D if convert_to_6d else C_INDEX_3D


# --------------------------------------------------------------------------
# fbhe composition
# --------------------------------------------------------------------------

def compose_fbhe(poses, expression, convert_to_6d: bool = True):
    """Build the VQ input from raw dataset channels.

    poses: (..., T, POSE_DIM) full pose channels; expression: (..., T, 100).
    Returns (..., T, full_dim): [jaw | c_index body+hand | expression]
    — the composition done per-batch inside every TrainWrapper
    (e.g. nets/inpainting/vq_teacher.py:148-157).
    """
    jaw_d = each_dim(convert_to_6d)[0]
    idx = c_index(convert_to_6d)
    jaw = poses[..., :jaw_d]
    mid = poses[..., idx]
    return jnp.concatenate([jaw, mid, expression], axis=-1)


def tofbhe(stats, idx):
    """Reindex per-channel stats (C,) from full layout to fbhe layout.

    Equivalent of nets/utils.py:16-25 for (C,)-shaped mean/std vectors.
    """
    jaw_d = 3 if idx.shape[0] == 135 else 6
    exp = stats[-EXPRESSION_DIM:]
    return jnp.concatenate([stats[:jaw_d], stats[idx], exp], axis=-1)


# --------------------------------------------------------------------------
# lower-body splicing (channel-last versions of data_utils/lower_body.py)
# --------------------------------------------------------------------------

def _lp(stand: bool):
    if stand:
        lp = np.zeros_like(LOWER_POSE_SIT)
        lp[6:9] = [3.0747, -0.0158, -0.0152]
        return lp
    return LOWER_POSE_SIT


def part2full(x, stand: bool = False):
    """(..., 9 + rest) modelled 3d channels -> (..., 36 + rest) full pose.

    Input layout: [jaw(3) | go(3) | body(3) | remaining upper channels]
    keyed to c_index_3d; splices the canned lower body back in the gaps
    (reference: data_utils/lower_body.py:66-83). Works on any leading dims
    with channels last.
    """
    lp = jnp.asarray(_lp(stand))
    shape = x.shape[:-1] + (27,)
    lp = jnp.broadcast_to(lp, shape)
    return jnp.concatenate(
        [x[..., :3], lp[..., :15], x[..., 3:6], lp[..., 15:21],
         x[..., 6:9], lp[..., 21:27], x[..., 9:]],
        axis=-1,
    )


def poses2pred(x, stand: bool = False):
    """Replace the lower body of a FULL 165-d pose with the canned pose
    (reference: data_utils/lower_body.py:103-117)."""
    lp = jnp.broadcast_to(
        jnp.asarray(LOWER_POSE_STAND if stand else LOWER_POSE_SIT),
        x.shape[:-1] + (27,),
    )
    return jnp.concatenate(
        [x[..., :3], lp[..., :15], x[..., 18:21], lp[..., 15:21],
         x[..., 27:30], lp[..., 21:27], x[..., 36:]],
        axis=-1,
    )


def pred2poses(x, gt):
    """Take the lower body from GT frames instead of the canned pose
    (reference: data_utils/lower_body.py:137-154)."""
    return jnp.concatenate(
        [x[..., :3], gt[..., 3:18], x[..., 3:6], gt[..., 21:27],
         x[..., 6:9], gt[..., 30:36], x[..., 9:]],
        axis=-1,
    )


def sit2stand(x):
    """Replace a full pose's lower body with the standing-zero pose
    (reference: data_utils/lower_body.py:86-100)."""
    lp = jnp.broadcast_to(jnp.asarray(_lp(stand=True)), x.shape[:-1] + (27,))
    return jnp.concatenate(
        [x[..., :3], lp[..., :15], x[..., 18:21], lp[..., 15:21],
         x[..., 27:30], lp[..., 21:27], x[..., 36:]],
        axis=-1,
    )


def poses2poses(x, gt):
    """Full pose with lower body taken from the FIRST GT frame
    (reference: data_utils/lower_body.py:157-166)."""
    first = gt[..., :1, :] if gt.ndim == x.ndim else gt
    lp3 = jnp.broadcast_to(first[..., 3:18], x.shape[:-1] + (15,))
    lp2 = jnp.broadcast_to(first[..., 21:27], x.shape[:-1] + (6,))
    lp1 = jnp.broadcast_to(first[..., 30:36], x.shape[:-1] + (6,))
    return jnp.concatenate(
        [x[..., :3], lp3, x[..., 18:21], lp2, x[..., 27:30], lp1, x[..., 36:]],
        axis=-1,
    )
