"""Rotation representation conversions as pure jit-able jnp functions.

Covers the conversions the reference vendors from PyTorch3D
(``data_utils/rotation_conversion.py``: axis-angle / quaternion / matrix /
6d), reimplemented from the underlying math:

  * quaternions: Shepperd's method for matrix->quat, standard Hamilton
    product layout (w, x, y, z)
  * axis-angle <-> matrix via quaternions (numerically safe near 0)
  * 6d: Zhou et al. "On the Continuity of Rotation Representations in
    Neural Networks" (CVPR 2019) — Gram-Schmidt of the first two rows

All functions broadcast over leading batch dimensions and are safe under
jit/vmap/grad. Everything is computed in float32 regardless of input dtype
(rotation math is precision-sensitive; bf16 inputs are upcast).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# quaternion <-> matrix
# ---------------------------------------------------------------------------

def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz unit quaternion -> (..., 3, 3) rotation matrix."""
    quat = _f32(quat)
    quat = quat / jnp.clip(jnp.linalg.norm(quat, axis=-1, keepdims=True), _EPS)
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion (w >= 0).

    Uses the branch-free variant of Shepperd's method: compute all four
    candidate quaternions (one per largest diagonal element) and select by
    magnitude — jit-friendly (no data-dependent control flow).
    """
    m = _f32(matrix)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidates q_k with |q_k|^2 = (4 q_k_max^2); pick the best-conditioned.
    qw2 = jnp.clip(1.0 + m00 + m11 + m22, 0.0)
    qx2 = jnp.clip(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.clip(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.clip(1.0 - m00 - m11 + m22, 0.0)

    cand_w = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cand_x = jnp.stack([m21 - m12, qx2, m10 + m01, m02 + m20], axis=-1)
    cand_y = jnp.stack([m02 - m20, m10 + m01, qy2, m21 + m12], axis=-1)
    cand_z = jnp.stack([m10 - m01, m02 + m20, m21 + m12, qz2], axis=-1)

    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4cand, 4)
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)  # (..., 4)
    # one-hot contraction instead of take_along_axis: minor-dim gathers
    # lower to serialized scalar loads on TPU (measured ~1000x slower)
    sel = jax.nn.one_hot(jnp.argmax(mags, axis=-1), 4, dtype=cands.dtype)
    q = jnp.einsum("...c,...cd->...d", sel, cands)
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    # canonicalize sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# axis-angle <-> quaternion / matrix
# ---------------------------------------------------------------------------

def axis_angle_to_quaternion(aa: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle (axis * angle) -> (..., 4) wxyz quaternion.

    Small-angle-safe: uses the Taylor expansion of sin(t/2)/t below 1e-3.
    """
    aa = _f32(aa)
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-3
    # sin(half)/angle; series: 1/2 - angle^2/48 + ...
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angle * angle) / 48.0, jnp.sin(half) / jnp.clip(angle, _EPS)
    )
    w = jnp.cos(half)
    xyz = aa * sin_half_over_angle
    return jnp.concatenate([w, xyz], axis=-1)


def quaternion_to_axis_angle(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3) axis-angle."""
    quat = _f32(quat)
    quat = quat * jnp.where(quat[..., :1] < 0, -1.0, 1.0)  # angle in [0, pi]
    w = jnp.clip(quat[..., :1], -1.0, 1.0)
    xyz = quat[..., 1:]
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm, w)
    small = norm < 1e-6
    # angle/norm with series fallback: 2/w * (1 + norm^2/(3w^2)) ~ 2 for unit q
    scale = jnp.where(small, 2.0 / jnp.clip(w, _EPS), angle / jnp.clip(norm, _EPS))
    return xyz * scale


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 3, 3) matrix (via quaternion; Rodrigues)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(aa))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) matrix -> (..., 3) axis-angle."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


# ---------------------------------------------------------------------------
# 6d <-> matrix
# ---------------------------------------------------------------------------

def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) continuous 6d rep -> (..., 3, 3) matrix.

    The 6 numbers are the first two ROWS of the matrix (flattened from
    m[..., :2, :] — matching the reference's convention at
    ``data_utils/rotation_conversion.py:512-533``); Gram-Schmidt + cross
    product rebuilds an orthonormal frame.
    """
    d6 = _f32(d6)
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.clip(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.clip(jnp.linalg.norm(a2p, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) matrix -> (..., 6): the first two rows, flattened."""
    m = _f32(matrix)
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


# ---------------------------------------------------------------------------
# convenience: axis-angle <-> 6d over packed joint vectors
# ---------------------------------------------------------------------------

def aa_to_6d_flat(aa_flat: jnp.ndarray) -> jnp.ndarray:
    """(..., J*3) packed axis-angle -> (..., J*6) packed 6d."""
    shape = aa_flat.shape
    j = shape[-1] // 3
    aa = aa_flat.reshape(shape[:-1] + (j, 3))
    d6 = matrix_to_rotation_6d(axis_angle_to_matrix(aa))
    return d6.reshape(shape[:-1] + (j * 6,))


def d6_to_aa_flat(d6_flat: jnp.ndarray) -> jnp.ndarray:
    """(..., J*6) packed 6d -> (..., J*3) packed axis-angle."""
    shape = d6_flat.shape
    j = shape[-1] // 6
    d6 = d6_flat.reshape(shape[:-1] + (j, 6))
    aa = matrix_to_axis_angle(rotation_6d_to_matrix(d6))
    return aa.reshape(shape[:-1] + (j * 3,))
