"""Full-metric holistic harness test: every reference metric present.

Exercises the complete ``eval.harness`` path — FGD (3 embedders), SMPL-X
joint metrics (MAD/MAJE/diverse ±_full), face metrics, MAAC, BC, fps —
with a fake generator and the synthetic SMPL-X fixture, mirroring
``scripts/test_holisticbody.py:98-369``.
"""

import numpy as np
import jax
import pytest

from probtalk_tpu.eval.fgd import FGDEvaluator
from probtalk_tpu.eval.harness import (
    body_metrics, face_metrics, run_harness,
)

T, CA, B = 100, 8, 3

EXPECTED_KEYS = {
    "MAD", "MAJE", "diverse", "MAD_full", "MAJE_full", "diverse_full",
    "face_L2", "face_LVD", "face_diverse", "fgd_fe", "fgd_bh", "fgd_fbhe",
    "MAAC", "BC", "fps", "diversity_fbhe", "clips",
}


@pytest.fixture(scope="module")
def smplx_model(tmp_path_factory):
    from probtalk_tpu.smplx import load_smplx, write_synthetic_smplx_npz

    path = str(tmp_path_factory.mktemp("smplx") / "synth.npz")
    write_synthetic_smplx_npz(path, n_verts=80, n_faces=10100, seed=1)
    return load_smplx(
        path,
        extra_joints_yaml="/root/reference/visualise/smplx/smplx_extra_joints.yaml")


def fake_generate(key, aud, speaker):
    b, t, _ = aud.shape
    return 0.1 * jax.random.normal(key, (b, t, 376))


def make_clip(rng, t=T):
    from probtalk_tpu.data.dataset import ClipData

    return ClipData(
        poses=0.2 * rng.normal(size=(t, 330)).astype(np.float32),
        expression=0.2 * rng.normal(size=(t, 100)).astype(np.float32),
        aud_feat=rng.normal(size=(t, CA)).astype(np.float32),
        betas=np.zeros(300, np.float32), speaker=1,
        onset_times=np.asarray([0.4, 1.1, 2.3], np.float32),
    )


class TestFullHarness:
    def test_all_metrics_present_and_finite(self, rng, smplx_model):
        from probtalk_tpu.cli.test_holistic import build_embedders

        clips = [make_clip(rng), make_clip(rng, t=95)]
        mean = np.zeros(430, np.float32)
        std = np.ones(430, np.float32)
        evaluator = FGDEvaluator(build_embedders(clips, mean, std))
        res = run_harness(fake_generate, clips, mean, std,
                          evaluator=evaluator, smplx_model=smplx_model,
                          B=B, verbose=False)
        missing = EXPECTED_KEYS - set(res)
        assert not missing, f"missing metrics: {missing}"
        for k, v in res.items():
            arr = np.asarray(v, np.float64)
            assert np.isfinite(arr).all(), (k, v)
        assert res["clips"] == 2
        assert len(res["MAAC"]) == 4

    def test_joints_fn_uses_clip_betas(self, rng, smplx_model):
        """VERDICT r2 item 10: harness joints must be shaped by the clip's
        own betas (reference test_holisticbody.py:292-299)."""
        from probtalk_tpu.eval.harness import make_joints_fn

        joints_fn = make_joints_fn(smplx_model)
        motion = 0.1 * rng.normal(size=(1, 8, 265)).astype(np.float32)
        neutral = joints_fn(motion)
        betas = 2.0 * rng.normal(size=300).astype(np.float32)
        shaped = joints_fn(motion, betas)
        assert neutral.shape == shaped.shape
        assert np.abs(neutral - shaped).max() > 1e-4

    def test_identical_pred_gives_zero_errors(self, rng):
        j = rng.normal(size=(T, 130, 3))
        pr = np.tile(j[None], (B, 1, 1, 1))
        m = body_metrics(j, pr)
        assert m["MAD"] < 1e-9 and m["MAJE"] < 1e-9 and m["diverse"] < 1e-9
        f = face_metrics(j, pr)
        assert f["face_L2"] < 1e-9 and f["face_LVD"] < 1e-9

    def test_metrics_match_reference_formulas(self, rng):
        """Torch-free golden: recompute body_loss with the literal
        reference expressions (test_holisticbody.py:116-139) in numpy."""
        gt = rng.normal(size=(T, 130, 3))
        pr = gt[None] + 0.1 * rng.normal(size=(B, T, 130, 3))
        m = body_metrics(gt, pr)

        g, p = gt[:, :22], pr[:, :, :22]
        gt_v = np.linalg.norm(g[1:] - g[:-1], axis=-1)
        pr_v = np.linalg.norm(p[:, 1:] - p[:, :-1], axis=-1)
        mad = (np.abs(pr_v - gt_v).sum(-1) * (1 / gt_v.shape[0])).sum(-1).mean()
        np.testing.assert_allclose(m["MAD"], mad, rtol=1e-9)
        maje = np.linalg.norm(g[None] - p, axis=-1).sum(-1).mean()
        np.testing.assert_allclose(m["MAJE"], maje, rtol=1e-9)
        div = np.linalg.norm(p.var(0, ddof=1), axis=-1).sum(-1).mean()
        np.testing.assert_allclose(m["diverse"], div, rtol=1e-9)
