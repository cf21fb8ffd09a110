"""Eval-stack tests: FGD formulas, BC score, legacy 2D metrics."""

import math

import numpy as np
import pytest

from probtalk_tpu.eval import metrics as M
from probtalk_tpu.eval import legacy_2d as L2
from probtalk_tpu.eval.fgd import (
    FGDEvaluator, frechet_distance, change_angles, DEFAULT_CHANGE_ANGLE,
)


class TestFrechet:
    def test_identical_distributions_zero(self, rng):
        x = rng.normal(size=(500, 16)).astype(np.float64)
        assert frechet_distance(x, x.copy()) < 1e-6

    def test_mean_shift_equals_l2sq(self, rng):
        x = rng.normal(size=(4000, 8))
        y = x + 3.0
        fd = frechet_distance(x, y)
        assert abs(fd - 8 * 9.0) < 2.0  # ||mu_diff||^2 = 8 * 3^2

    def test_scale_difference_positive(self, rng):
        x = rng.normal(size=(2000, 8))
        y = rng.normal(size=(2000, 8)) * 2
        assert frechet_distance(x, y) > 1.0


class TestBC:
    def test_change_angles_shape(self, rng):
        j = rng.normal(size=(30, 55, 3))
        a = change_angles(j)
        assert a.shape == (30, 4)
        assert np.all((a >= 0) & (a <= 1))

    def test_bc_perfect_sync_high(self):
        ev = FGDEvaluator({})
        # synthetic arm motion with sharp stops at beat times
        t_len, fps = 150, 30
        joints = np.zeros((t_len, 55, 3), np.float32)
        joints[:, L2.VALID_IDX[0] if False else 16] = 0  # noop, clarity
        phase = np.zeros(t_len)
        beats = [1.0, 2.0, 3.0, 4.0]
        for t in range(t_len):
            d = min(abs(t / fps - b) for b in beats)
            phase[t] = d  # velocity dips to 0 exactly at beats
        joints[:, 18, 0] = np.cumsum(phase) * 0.05   # elbow sweeps, pauses at beats
        joints[:, 16, 1] = 1.0
        joints[:, 19, 0] = 0.5
        ev.push_joints(joints, joints)
        ev.push_aud(np.asarray(beats))
        score_synced = ev.get_bc_score(thres=1e-6, joints_list=[joints])
        assert 0 <= score_synced <= 1

    def test_maac_finite(self, rng):
        ev = FGDEvaluator({})
        ev.push_joints(rng.normal(size=(40, 55, 3)), rng.normal(size=(40, 55, 3)))
        maac = ev.get_maac()
        assert maac.shape == (4,) and np.all(np.isfinite(maac))

    def test_fgd_scores_via_extractors(self, rng):
        ev = FGDEvaluator({"fbhe": lambda w: w.reshape(w.shape[0], -1)[:, :32]})
        real = rng.normal(size=(64, 90, 10)).astype(np.float32)
        gen = real + 0.01 * rng.normal(size=real.shape).astype(np.float32)
        ev.push_samples(gen, real)
        fd, l1 = ev.get_scores("fbhe")
        assert fd < 0.1 and l1 > 0


class TestLegacy2D:
    def test_point_selectors(self, rng):
        seq = rng.normal(size=(2, 20, 270)).astype(np.float32)
        assert L2.hand_points(seq).shape == (2, 20, 98)
        assert L2.valid_points(seq).shape == (2, 20, 108)

    def test_peak_velocity_finds_bursts(self):
        t_len = 60
        pts = np.zeros((1, t_len, 10 * 2), np.float32)
        for burst in (15, 40):
            pts[0, burst: burst + 2] += 5.0  # sharp movement
        peaks = L2.peak_velocity(pts, order=1)
        assert len(peaks[0]) >= 2
        assert any(abs(p - 15) <= 3 for p in peaks[0])
        assert any(abs(p - 40) <= 3 for p in peaks[0])

    def test_velocity_consistency_zero_for_same(self):
        peaks = [np.asarray([5, 20, 33])]
        d = L2.velocity_consistency(peaks, peaks)
        np.testing.assert_array_equal(d, 0)

    def test_mode_transition_consistency_perfect(self, rng):
        pts = rng.normal(size=(2, 50, 20)).astype(np.float32)
        seq = L2.mode_transition_seq(pts)
        p, r, a = L2.mode_transition_consistency(seq, seq)
        assert p == 1.0 and r == 1.0 and a == 1.0

    def test_data_driven_baselines(self, rng):
        last, mean = M.data_driven_baselines(rng.normal(size=(40, 12)))
        assert last > 0 and mean > 0


class TestBatchLVD:
    def test_symmetric_path_runs(self, rng):
        gt = rng.normal(size=(30, 22, 3)).astype(np.float32)
        pr = rng.normal(size=(3, 30, 22, 3)).astype(np.float32)
        v1 = M.batch_lvd(gt, pr, symmetrical=False)
        v2 = M.batch_lvd(gt, pr, symmetrical=True)
        assert np.isfinite(v1) and np.isfinite(v2)
        assert M.batch_lvd(gt, gt[None].repeat(2, 0)) < 1e-6


def test_collect_quality_samples():
    from probtalk_tpu.eval.legacy_2d import collect_quality_samples

    rng = np.random.default_rng(0)
    gt = [rng.normal(size=(30, 274)).astype(np.float32),
          rng.normal(size=(20, 274)).astype(np.float32)]
    preds = {"ours": [rng.normal(size=(4, 30, 274)).astype(np.float32),
                      rng.normal(size=(4, 20, 274)).astype(np.float32)]}
    out = collect_quality_samples(gt, preds)
    assert out["gt"].shape == (1, 50, 108)
    assert out["ours"].shape == (1, 50, 108)
