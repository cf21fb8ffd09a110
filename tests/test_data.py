"""Data pipeline tests against the real SHOW demo fixtures in the reference
(read-only data assets: demo_audio/*, hand_component.json, norm_stats.npy)."""

import os

import numpy as np
import pytest

from probtalk_tpu.data import audio as audio_lib
from probtalk_tpu.data import preprocess as pp
from probtalk_tpu.data.dataset import ClipData, WindowedDataset

REF = "/root/reference"
CLIP_DIR = f"{REF}/demo_audio/chemistry/68991-00_00_23-00_00_33"
MOTION = f"{CLIP_DIR}/68991-00_00_23-00_00_33.pkl"
WAV = f"{CLIP_DIR}/68991-00_00_23-00_00_33.wav"
HANDS = f"{REF}/data_utils/hand_component.json"
NORM = f"{REF}/data_utils/norm_stats.npy"

needs_fixtures = pytest.mark.skipif(
    not os.path.exists(MOTION), reason="reference demo fixtures not mounted"
)


class TestAudio:
    @needs_fixtures
    def test_load_wav(self):
        x = audio_lib.load_wav(WAV, target_sr=16000)
        assert x.ndim == 1
        assert abs(len(x) / 16000 - 10.0) < 0.1  # 10s clip
        assert np.abs(x).max() <= 1.0

    def test_mfcc_shape(self, rng):
        x = rng.normal(size=16000).astype(np.float32) * 0.1
        feat = audio_lib.mfcc(x, sr=16000, n_mfcc=64, fps=30)
        assert feat.shape[1] == 64
        assert 28 <= feat.shape[0] <= 33  # ~1s at 30fps

    def test_mel_finite(self, rng):
        x = rng.normal(size=8000).astype(np.float32)
        m = audio_lib.log_mel(x)
        assert np.all(np.isfinite(m))

    def test_onsets_detect_clicks(self):
        sr = 16000
        x = np.zeros(sr * 2, np.float32)
        for t in (0.5, 1.0, 1.5):
            i = int(t * sr)
            x[i: i + 200] += np.sin(2 * np.pi * 440 * np.arange(200) / sr).astype(np.float32)
        times = audio_lib.onset_times(x, sr=sr)
        assert len(times) >= 3
        for t in (0.5, 1.0, 1.5):
            assert np.min(np.abs(times - t)) < 0.1

    def test_interp_to_fps(self, rng):
        f = rng.normal(size=(50, 8)).astype(np.float32)
        out = audio_lib.interp_features_to_fps(f, 30)
        assert out.shape == (30, 8)
        np.testing.assert_allclose(out[0], f[0], atol=1e-6)
        np.testing.assert_allclose(out[-1], f[-1], atol=1e-6)


@needs_fixtures
class TestPreprocess:
    def test_clip_pipeline(self):
        out = pp.preprocess_clip(MOTION, WAV, HANDS, convert_to_6d=True,
                                 audio_feat="mfcc")
        assert out["poses"].shape == (300, 330)
        assert out["expression"].shape == (300, 100)
        assert out["betas"].shape == (300,)
        assert out["aud_feat"].shape == (300, 64)
        assert np.all(np.isfinite(out["poses"]))
        # 6d columns of untouched joints come from valid rotations:
        # first-two-rows of a rotation matrix have unit norm per row
        row1 = out["poses"][:, 0:3]
        np.testing.assert_allclose(np.linalg.norm(row1, axis=-1), 1.0, atol=1e-3)

    def test_6d_roundtrip_through_3d(self):
        out = pp.preprocess_clip(MOTION, None, HANDS, convert_to_6d=True)
        back = pp.pose_6d_to_3d(out["poses"])
        clip = pp.load_torch_pickle(MOTION)
        pose165 = pp.expand_hands(pp.assemble_pose99(clip), HANDS)
        # axis-angle roundtrip is exact up to 2*pi wrapping; demo data is small-angle
        err = np.abs(back - pose165)
        assert np.percentile(err, 99) < 1e-3

    def test_norm_stats_fixture(self):
        mean, std = pp.load_norm_stats(NORM)
        assert mean.shape == (430,) and std.shape == (430,)
        assert np.all(std > 0)

    def test_compute_norm_stats_shape(self):
        out = pp.preprocess_clip(MOTION, None, HANDS)
        mean, std = pp.compute_norm_stats([out["poses"]], [out["expression"]])
        assert mean.shape == (430,) and std.shape == (430,)
        # rotation stats repeat per joint
        np.testing.assert_allclose(mean[:6], mean[6:12])


@needs_fixtures
class TestWindowedDataset:
    def test_windows_and_batches(self):
        out = pp.preprocess_clip(MOTION, WAV, HANDS, audio_feat="mfcc")
        mean, std = pp.load_norm_stats(NORM)
        clip = ClipData(poses=out["poses"], expression=out["expression"],
                        aud_feat=out["aud_feat"], betas=out["betas"], speaker=1)
        ds = WindowedDataset([clip], window=180, stride=6, mean=mean, std=std)
        assert len(ds) == (300 - 180) // 6 + 1
        batches = list(ds.fbhe_batches(4, seed=0))
        assert len(batches) == len(ds) // 4
        b = batches[0]
        assert b["poses_fbhe"].shape == (4, 180, 376)
        assert b["aud_feat"].shape == (4, 180, 64)
        assert b["speaker"].shape == (4,)
        # normalized data should be roughly standard scale
        assert np.abs(b["poses_fbhe"]).mean() < 5.0


class TestClipDiscoveryModes:
    """The reference's three dataset_load_mode layouts
    (dataloader_torch.py:75-190) as discovery iterators."""

    def _touch(self, base):
        os.makedirs(os.path.dirname(base), exist_ok=True)
        open(base + ".pkl", "wb").write(b"x")
        open(base + ".wav", "wb").write(b"x")

    def test_nested_old_json_layout(self, tmp_path):
        from probtalk_tpu.cli.data_build import find_clips_nested

        root = str(tmp_path)
        self._touch(os.path.join(root, "oliver", "vid1", "train",
                                 "clip0", "clip0"))
        self._touch(os.path.join(root, "oliver", "vid1", "test",
                                 "clip1", "clip1"))
        self._touch(os.path.join(root, "seth", "vid2", "train",
                                 "clip2", "clip2"))
        got = list(find_clips_nested(root, ["oliver", "seth"], "train"))
        assert [(s, c) for s, c, _ in got] == [
            ("oliver", "vid1__clip0"), ("seth", "vid2__clip2")]

    def test_split_json_layout_with_fallbacks(self, tmp_path):
        from probtalk_tpu.cli.data_build import find_clips_split

        root = str(tmp_path)
        # exact match + the reference's '__' -> '_' directory fallback
        self._touch(os.path.join(root, "oliver", "a__b", "c0", "c0"))
        self._touch(os.path.join(root, "seth", "x_y", "c1", "c1"))
        split = str(tmp_path / "split.npy")
        np.save(split, np.asarray(["oliver/a__b/c0", "seth/x__y/c1",
                                   "conan/missing/c2"]))
        got = list(find_clips_split(root, split))
        assert [(s, c) for s, c, _ in got] == [
            ("oliver", "a__b__c0"), ("seth", "x_y__c1")]
