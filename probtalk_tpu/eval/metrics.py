"""Motion metrics: LVD, diversity, MAD/MAJE helpers.

Capability of the reference's ``evaluation/metrics.py`` in numpy/jax,
channel-last. Formula definitions follow the reference exactly so numbers
are comparable.
"""

from __future__ import annotations

import numpy as np

# symmetric-joint bookkeeping for Batch_LVD (reference lower_body.py:168-175)
REARRANGE = list(range(22))
SYMMETRY = np.asarray(
    [0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 1, 1, 1, 1], bool
)


def lvd(gt_kps: np.ndarray, pr_kps: np.ndarray) -> float:
    """Velocity-difference L1 between joint sequences (T, J, 3)
    (reference LVD, metrics.py:96-109)."""
    gt = np.asarray(gt_kps).squeeze()
    pr = np.asarray(pr_kps).squeeze()
    gt_v = np.linalg.norm(gt[1:] - gt[:-1], axis=-1)
    pr_v = np.linalg.norm(pr[1:] - pr[:-1], axis=-1)
    return float(np.mean(np.sum(np.abs(pr_v - gt_v), axis=-1)))


def batch_lvd(gt_kps: np.ndarray, pr_kps: np.ndarray,
              symmetrical: bool = False) -> float:
    """Batched LVD with optional dominant-side symmetric-joint handling
    (reference Batch_LVD, metrics.py:27-93). gt (T, J, 3); pr (B, T, J, 3)."""
    length = min(gt_kps.shape[0], pr_kps.shape[1])
    gt = np.asarray(gt_kps)[:length]
    pr = np.asarray(pr_kps)[:, :length]

    if not symmetrical:
        gt_v = np.linalg.norm(gt[1:] - gt[:-1], axis=-1)         # (T-1, J)
        pr_v = np.linalg.norm(pr[:, 1:] - pr[:, :-1], axis=-1)   # (B, T-1, J)
        w = 1.0 / gt_v.shape[0]
        return float(np.mean(np.sum(np.sum(np.abs(pr_v - gt_v[None]), -1) * w, -1)))

    sym = SYMMETRY
    gt = gt[:, REARRANGE]
    ns_gt, ys_gt = gt[:, ~sym], gt[:, sym].reshape(length, -1, 2, 3)
    ns_gt_v = np.linalg.norm(ns_gt[1:] - ns_gt[:-1], axis=-1)
    ys_gt_v = np.linalg.norm(ys_gt[1:] - ys_gt[:-1], axis=-1)    # (T-1, P, 2)
    move_side = (ys_gt_v[..., 0].sum(-1) > ys_gt_v[..., 1].sum(-1))
    ys_gt_v = np.where(move_side[:, None], ys_gt_v[..., 0], ys_gt_v[..., 1])
    gt_v = np.concatenate([ns_gt_v, ys_gt_v], axis=1)

    pr = pr[:, :, REARRANGE]
    ns_pr, ys_pr = pr[:, :, ~sym], pr[:, :, sym].reshape(pr.shape[0], length, -1, 2, 3)
    ns_pr_v = np.linalg.norm(ns_pr[:, 1:] - ns_pr[:, :-1], axis=-1)
    ys_pr_v = np.linalg.norm(ys_pr[:, 1:] - ys_pr[:, :-1], axis=-1)
    move_side = (ys_pr_v[..., 0].sum(-1) > ys_pr_v[..., 1].sum(-1))
    ys_pr_v = np.where(move_side[..., None], ys_pr_v[..., 0], ys_pr_v[..., 1])
    pr_v = np.concatenate([ns_pr_v, ys_pr_v], axis=2)

    w = 1.0 / gt_v.shape[0]
    return float(np.mean(np.sum(np.sum(np.abs(pr_v - gt_v[None]), -1) * w, -1)))


def diversity(kps: np.ndarray) -> float:
    """Mean pairwise L1 over B generated sequences (B, ...): the reference's
    diversity metric (metrics.py:96-109), computed without the O(B^2)
    python loop."""
    x = np.asarray(kps).reshape(kps.shape[0], -1)
    b = x.shape[0]
    if b < 2:
        return 0.0
    # sum_{i<j} mean|xi-xj| via broadcasting
    total = 0.0
    for i in range(b):  # B is small (16); keep memory bounded
        total += np.mean(np.abs(x[i + 1:] - x[i][None]), axis=-1).sum()
    return float(total / (b * (b - 1) / 2))


def data_driven_baselines(gt_kps: np.ndarray):
    """(T, D) -> (last_step, mean) velocity baselines
    (reference metrics.py:13-24)."""
    v = np.abs(gt_kps[1:] - gt_kps[:-1])
    mean = np.mean(np.abs(v - v.mean(axis=0, keepdims=True)))
    last = np.mean(np.abs(v - (gt_kps[1] - gt_kps[0])[None]))
    return float(last), float(mean)


def mad_maje(gt_joints: np.ndarray, pr_joints: np.ndarray):
    """Mean absolute joint/acceleration errors over (T, J, 3) sequences
    (the per-clip body metrics of scripts/test_holisticbody.py:116-139)."""
    maje = float(np.mean(np.abs(pr_joints - gt_joints)))
    gt_acc = np.diff(gt_joints, n=2, axis=0)
    pr_acc = np.diff(pr_joints, n=2, axis=0)
    mad = float(np.mean(np.abs(pr_acc - gt_acc)))
    return mad, maje
