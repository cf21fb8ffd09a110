"""FGD / beat-consistency / MAAC evaluator.

Capability of the reference's ``EmbeddingSpaceEvaluator``
(``evaluation/FGD.py:19-257``): three frozen embedder AEs (face 'fe', body
'bh', full 'fbhe') embed 90-frame windows; Fréchet distance over the
embedding statistics; beat consistency from elbow/wrist angular-velocity
minima vs audio onsets; MAAC normalizers.

Feature extraction runs jit-batched on device; the Gaussian statistics /
matrix sqrt run host-side in numpy/scipy (tiny 128x128 problems).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
from scipy import linalg

# elbow/wrist joint index pairs for the change-angle computation
# (reference FGD.py:86-99: SMPL-X joints 16-21 are shoulders/elbows/wrists,
# 9 is spine3)
_VEC_A = [16, 17, 20, 21, 9, 9, 18, 19]
_VEC_B = [18, 19, 18, 19, 16, 17, 16, 17]
_PAIR_X = [0, 1, 4, 5]
_PAIR_Y = [2, 3, 6, 7]

DEFAULT_CHANGE_ANGLE = np.asarray(
    [1.7895e-04, 1.8926e-04, 8.1730e-05, 7.3042e-05], np.float64
)


def change_angles(joints: np.ndarray) -> np.ndarray:
    """(T, J, 3) joints -> (T, 4) arm-bend angles in units of pi."""
    vec = joints[:, _VEC_A] - joints[:, _VEC_B]
    vec = vec / np.clip(np.linalg.norm(vec, axis=-1, keepdims=True), 1e-8, None)
    inner = np.sum(vec[:, _PAIR_X] * vec[:, _PAIR_Y], axis=-1)
    return np.arccos(np.clip(inner, -1.0, 1.0)) / math.pi


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray,
                     eps: float = 1e-6) -> float:
    """FID-style Fréchet distance between two feature sets (N, D)."""
    mu1, mu2 = feats_a.mean(0), feats_b.mean(0)
    s1 = np.cov(feats_a, rowvar=False)
    s2 = np.cov(feats_b, rowvar=False)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(s1.dot(s2))
    if not np.isfinite(covmean).all():
        offset = np.eye(s1.shape[0]) * eps
        covmean = linalg.sqrtm((s1 + offset).dot(s2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))


class FGDEvaluator:
    """Accumulates embeddings/joints/onsets across test clips, then scores."""

    def __init__(self, extract_fns: dict):
        """extract_fns: {'fe'|'bh'|'fbhe': fn(poses (B,90,C)) -> (B,128)}"""
        self.extract_fns = extract_fns
        self.reset()

    def reset(self):
        self.real_feat = {k: [] for k in self.extract_fns}
        self.gene_feat = {k: [] for k in self.extract_fns}
        self.real_joints = []
        self.gene_joints = []
        self.audio_beats = []

    def push_samples(self, generated_windows, real_windows):
        """90-frame fbhe windows: generated (N, 90, C), real (M, 90, C)."""
        for k, fn in self.extract_fns.items():
            self.real_feat[k].append(np.asarray(fn(real_windows)))
            self.gene_feat[k].append(np.asarray(fn(generated_windows)))

    def push_joints(self, generated, real):
        self.gene_joints.append(np.asarray(generated))
        self.real_joints.append(np.asarray(real))

    def push_aud(self, onset_times):
        self.audio_beats.append(np.asarray(onset_times))

    # ------------------------------------------------------------------
    def get_scores(self, which: str):
        """-> (frechet_dist, feat_l1) for 'fe' | 'bh' | 'fbhe'
        (reference get_scores, FGD.py:156-197)."""
        gen = np.vstack(self.gene_feat[which])
        real = np.vstack(self.real_feat[which])
        fd = frechet_distance(gen, real)
        n = min(len(gen), len(real))
        feat_l1 = float(np.mean(np.sum(np.abs(real[:n] - gen[:n]), axis=-1)))
        return fd, feat_l1

    def get_maac(self) -> np.ndarray:
        """Mean absolute angle change per arm pair over GT joints
        (reference get_MAAC, FGD.py:82-97)."""
        vels = []
        for joints in self.real_joints:
            ang = change_angles(joints)
            vels.append(np.mean(np.abs(np.diff(ang, axis=0)), axis=0))
        return np.mean(np.stack(vels), axis=0)

    def get_bc_score(self, thres: float = 0.01,
                     change_angle: Optional[np.ndarray] = None,
                     joints_list: Optional[list] = None,
                     sigma: float = 0.1) -> float:
        """Beat consistency: local minima of normalized angular velocity vs
        audio onset times (reference get_BCscore, FGD.py:99-154)."""
        ca = DEFAULT_CHANGE_ANGLE if change_angle is None else np.asarray(change_angle)
        joints_list = joints_list if joints_list is not None else self.gene_joints
        total, hits = 0, 0.0
        for joints, beats in zip(joints_list, self.audio_beats):
            if joints.ndim == 4:
                joints = joints[0]
            ang = change_angles(joints)
            vel = np.abs(np.diff(ang, axis=0)) / ca / len(ca)
            vel = vel.sum(-1)
            d = np.concatenate([[0.0], vel])
            motion_beats = []
            for t in range(1, joints.shape[0] - 1):
                if d[t] < d[t - 1] and d[t] < d[t + 1] and (
                        d[t - 1] - d[t] >= thres or d[t + 1] - d[t] >= thres):
                    motion_beats.append(t / 30.0)
            if motion_beats:
                mb = np.asarray(motion_beats)
                for b in beats:
                    hits += math.exp(-np.min((b - mb) ** 2) / (2 * sigma * sigma))
            total += len(beats)
        return hits / max(total, 1)
