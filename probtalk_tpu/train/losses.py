"""Loss library: the reference's training objectives as pure functions.

Covers ``losses/losses.py`` plus the stage-specific losses embedded in the
train wrappers (``nets/inpainting/vq_teacher.py:184-230``,
``refiner.py:313-391``). Channel-last (B, T, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from probtalk_tpu.core import body_parts


def smooth_l1(pred, target, beta: float = 0.01):
    """Huber/smooth-L1 with threshold beta (torch F.smooth_l1_loss semantics)."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def cross_entropy_label_smooth(logits, labels, epsilon: float = 0.1):
    """CE with label smoothing (reference losses/losses.py:12-41)."""
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, n)
    soft = (1 - epsilon) * onehot + epsilon / n
    return -jnp.mean(jnp.sum(soft * logp, axis=-1))


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1))


def vq_recon_loss(pred, gt, vq_type: str = "fbhe", convert_to_6d: bool = True,
                  beta: float = 0.01, each_dim=None):
    """Part-weighted smooth-L1 + velocity L1 of the PQ-VAE stage
    (reference vq_teacher.py:184-230: face/exp weight 0.1, body/hand 0.4,
    plus mean |Δpred - Δgt| velocity term).

    each_dim overrides the [jaw, body, hand, expression] channel split
    (defaults to the SMPL-X 6d layout). Returns (total, dict of parts).
    """
    each = list(each_dim) if each_dim is not None else body_parts.each_dim(convert_to_6d)
    dims = _cum_dims(each)
    ld = {}
    if vq_type == "fbhe":
        face = smooth_l1(pred[..., : dims[1]], gt[..., : dims[1]], beta)
        body = smooth_l1(pred[..., dims[1]: dims[3]], gt[..., dims[1]: dims[3]], beta)
        hand = smooth_l1(pred[..., dims[3]: dims[4]], gt[..., dims[3]: dims[4]], beta)
        expr = smooth_l1(pred[..., dims[4]:], gt[..., dims[4]:], beta)
        w = 0.4
        rec = (face + expr) * (0.5 - w) + (body + hand) * w
        ld.update(face_loss=face, body_loss=body, hand_loss=hand, exp_loss=expr)
    elif vq_type == "bh":
        body = smooth_l1(pred[..., : each[1]], gt[..., : each[1]], beta)
        hand = smooth_l1(pred[..., each[1]:], gt[..., each[1]:], beta)
        rec = (body + hand) / 2
        ld.update(body_loss=body, hand_loss=hand)
    elif vq_type == "fe":
        jaw = smooth_l1(pred[..., : each[0]], gt[..., : each[0]], beta)
        expr = smooth_l1(pred[..., -each[3]:], gt[..., -each[3]:], beta)
        rec = (jaw + expr) / 2
        ld.update(jaw_loss=jaw, exp_loss=expr)
    else:
        raise ValueError(vq_type)

    vel = jnp.mean(jnp.abs(jnp.diff(pred, axis=-2) - jnp.diff(gt, axis=-2)))
    ld.update(rec_loss=rec, velocity_loss=vel)
    return rec + vel, ld


def _cum_dims(each):
    """[jaw, body, hand, expr] -> boundary list [b_j, b_e, b_b, b_h, b_f]
    (the nets/base.py:97 dim_list layout; eye dim is always 0 here)."""
    return [0, each[0], each[0], each[0] + each[1], each[0] + each[1] + each[2]]


def refiner_loss(pred, gt, mask, rf_type: str = "fbhe", convert_to_6d: bool = True,
                 each_dim=None):
    """Masked part-weighted L1 + velocity of the refiner stage
    (reference refiner.py:313-391). mask: (B, T, 1), 1 = known context
    (excluded from the loss via nmask). each_dim overrides the channel split."""
    each = list(each_dim) if each_dim is not None else body_parts.each_dim(convert_to_6d)
    dims = _cum_dims(each)
    nmask = 1.0 - mask
    t_n = jnp.clip(jnp.sum(nmask), 1.0)
    ld = {}

    def part(sl, d):
        return jnp.sum(jnp.abs(pred[..., sl] * nmask - gt[..., sl] * nmask)) / (t_n * d)

    if rf_type == "fbhe":
        face = part(slice(0, dims[1]), each[0])
        body = part(slice(dims[1], dims[3]), each[1])
        hand = part(slice(dims[3], dims[4]), each[2])
        expr = part(slice(dims[4], None), each[3])
        rec = (face + body + hand + expr) / 4
        ld.update(face_loss=face, body_loss=body, hand_loss=hand, exp_loss=expr)
        v_sl = slice(0, pred.shape[-1] - each[3])
    elif rf_type == "bh":
        body = part(slice(0, each[1]), each[1])
        hand = part(slice(each[1], None), each[2])
        rec = (body + hand) / 2
        ld.update(body_loss=body, hand_loss=hand)
        v_sl = slice(None)
    elif rf_type == "fe":
        face = part(slice(0, dims[1]), each[0])
        expr_sq = jnp.sum((pred[..., dims[1]:] * nmask - gt[..., dims[1]:] * nmask) ** 2) / (
            t_n * each[3]
        )
        rec = (face + expr_sq) / 2
        ld.update(face_loss=face, exp_loss=expr_sq)
        v_sl = slice(0, pred.shape[-1] - each[3])
    else:
        raise ValueError(rf_type)

    vel = jnp.mean(jnp.abs(jnp.diff(pred[..., v_sl], axis=-2) - jnp.diff(gt[..., v_sl], axis=-2)))
    ld.update(rec_loss=rec, velocity_loss=vel)
    return rec + vel, ld


def keypoint_l1(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def kl_normal(mu, logvar):
    """KL(N(mu, sigma) || N(0, 1)) (reference KLLoss)."""
    return -0.5 * jnp.mean(1 + logvar - mu ** 2 - jnp.exp(logvar))
