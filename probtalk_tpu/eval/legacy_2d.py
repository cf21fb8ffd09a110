"""Legacy 2D-keypoint evaluation metrics (peak velocity, mode transitions).

Capability of the reference's ``evaluation/peak_velocity.py`` /
``mode_transition.py`` / ``diversity_LVD.py`` / ``util.py``. NOTE: those
scripts are bit-rotted upstream — they import ``peak_velocity``,
``velocity_consistency``, ``mode_transition_seq`` and
``mode_transition_consistency`` from ``evaluation.metrics`` where no such
functions exist. The implementations here reconstruct the metrics from the
scripts' usage and the Speech2Gesture-era literature they follow:

  * peak velocity: local maxima of the smoothed hand-keypoint speed
  * velocity consistency: per-peak distance from a peak in one sequence to
    the nearest peak in the other (frames)
  * mode transitions: binarized moving/holding state from thresholded
    velocity; precision/recall/accuracy of predicted transition frames

Index maps (hand_points / valid_points over the 135-point 2D layout) follow
``evaluation/util.py:110-128`` exactly.
"""

from __future__ import annotations

import numpy as np

HAND_IDX = [1, 2, 3, 4, 5, 6, 7] + list(range(25, 25 + 42))
VALID_IDX = list(range(12)) + list(range(25, 25 + 42))


def hand_points(seq: np.ndarray) -> np.ndarray:
    """(B, T, 135*2) -> (B, T, 49*2) hand (+arm) points
    (reference util.py:110-117)."""
    b, t, _ = seq.shape
    pts = seq.reshape(b, t, -1, 2)
    return pts[:, :, HAND_IDX].reshape(b, t, -1)


def valid_points(seq: np.ndarray) -> np.ndarray:
    """(B, T, 135*2) -> (B, T, 108) hands + head points
    (reference util.py:119-128)."""
    b, t, _ = seq.shape
    pts = seq.reshape(b, t, -1, 2)
    out = pts[:, :, VALID_IDX].reshape(b, t, -1)
    assert out.shape[-1] == 108, out.shape
    return out


def smooth(x: np.ndarray, k: int = 5) -> np.ndarray:
    """Moving-average smoothing along time (reference util.smooth)."""
    if k <= 1:
        return x
    pad = k // 2
    xp = np.pad(x, [(pad, pad)] + [(0, 0)] * (x.ndim - 1), mode="edge")
    kernel = np.ones(k) / k
    return np.apply_along_axis(lambda v: np.convolve(v, kernel, "valid"), 0, xp)


def speed(points: np.ndarray, order: int = 2) -> np.ndarray:
    """(B, T, D) -> (B, T-order) mean keypoint speed (order-th difference)."""
    d = np.diff(points, n=order, axis=1)
    b, t, _ = d.shape
    return np.linalg.norm(d.reshape(b, t, -1, 2), axis=-1).mean(-1)


def peak_velocity(points: np.ndarray, order: int = 2,
                  min_separation: int = 4) -> list:
    """-> per-batch arrays of peak frame indices of the smoothed speed."""
    v = speed(points, order)
    peaks_all = []
    for row in v:
        row = smooth(row[:, None])[:, 0]
        peaks = []
        last = -min_separation
        for i in range(1, len(row) - 1):
            if row[i] >= row[i - 1] and row[i] >= row[i + 1] and \
                    i - last >= min_separation:
                peaks.append(i)
                last = i
        peaks_all.append(np.asarray(peaks))
    return peaks_all


def velocity_consistency(peaks_a: list, peaks_b: list) -> np.ndarray:
    """For each peak in a: distance (frames) to nearest peak in b; pooled
    over the batch."""
    out = []
    for pa, pb in zip(peaks_a, peaks_b):
        if len(pa) == 0 or len(pb) == 0:
            continue
        out.append(np.min(np.abs(pa[:, None] - pb[None, :]), axis=1))
    return np.concatenate(out) if out else np.zeros(0)


def mode_transition_seq(points: np.ndarray, threshold: float = None) -> np.ndarray:
    """(B, T, D) -> (B, T-1) binary moving/holding state."""
    v = speed(points, order=1)
    if threshold is None:
        threshold = np.median(v)
    return (v > threshold).astype(np.int32)


def mode_transition_consistency(pred_seq: np.ndarray, gt_seq: np.ndarray,
                                tol: int = 3):
    """Precision/recall/accuracy of predicted transition FRAMES within a
    +-tol window of GT transitions."""
    def transitions(seq):
        return [np.nonzero(np.diff(row) != 0)[0] for row in seq]

    p_tr, g_tr = transitions(pred_seq), transitions(gt_seq)
    tp = fp = fn = 0
    for p, g in zip(p_tr, g_tr):
        matched = np.zeros(len(g), bool)
        for t in p:
            if len(g) and np.min(np.abs(g - t)) <= tol:
                matched[np.argmin(np.abs(g - t))] = True
            else:
                fp += 1
        tp += int(matched.sum())
        fn += int((~matched).sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    t_len = min(pred_seq.shape[1], gt_seq.shape[1])
    accuracy = float(np.mean(pred_seq[:, :t_len] == gt_seq[:, :t_len]))
    return precision, recall, accuracy


def collect_quality_samples(gt_by_clip, pred_by_model_by_clip):
    """Assemble the 'quality samples' dump of the legacy 2D eval
    (``evaluation/get_quality_samples.py:27-61``): per model, the
    valid-point sequences of every test clip concatenated along time.

    gt_by_clip: [(T_i, 274) 2D keypoint arrays]; pred_by_model_by_clip:
    {model_name: [(B, T_i, 274) arrays]} — returns {'gt': (1, sum_T, 108),
    model_name: (1, sum_T, 108), ...} ready to json-dump.
    """
    out = {"gt": np.concatenate(
        [valid_points(g[None])[0:1] for g in gt_by_clip], axis=1)}
    for name, clips in pred_by_model_by_clip.items():
        out[name] = np.concatenate(
            [valid_points(p)[0:1] for p in clips], axis=1)
    return out
