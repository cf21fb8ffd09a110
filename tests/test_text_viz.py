"""Text-feature alignment and visualization tests."""

import os

import numpy as np
import pytest

from probtalk_tpu.data import text as text_lib
from probtalk_tpu.viz.render import (
    render_skeleton_frames, grid_layout, save_gif, save_mjpeg_avi, RenderTool,
)

TXT = ("/root/reference/demo_audio/chemistry/68991-00_00_23-00_00_33/"
       "68991-00_00_23-00_00_33.txt")


class TestTranscript:
    @pytest.mark.skipif(not os.path.exists(TXT), reason="fixture missing")
    def test_parse_real_transcript(self):
        words = text_lib.parse_transcript(TXT)
        assert len(words) > 5
        s, e, w = words[0]
        assert w == "Come" and s == 0.0 and e == 0.3
        # non-negative durations (zero-length words occur in real data)
        assert all(e >= s for s, e, _ in words)

    def test_talk_or_not(self):
        words = [(0.0, 0.5, "hi"), (1.0, 1.5, "there")]
        f = text_lib.talk_or_not(words, 60, fps=30)
        assert f.shape == (60, 3)
        assert f[5, 0] == 1 and f[5, 1] == 0     # speaking
        assert f[25, 0] == 0 and f[25, 1] == 1   # silent gap
        assert f[0, 2] == 1 and f[30, 2] == 1    # onsets
        assert f[:, :2].sum(-1).max() == 1.0

    def test_text_features_hash_embed(self):
        words = [(0.0, 0.5, "hello"), (0.5, 1.0, "world")]
        f = text_lib.text_features(words, 30, fps=30, dim=32)
        assert f.shape == (30, 32)
        # same word -> same embedding; different words differ
        np.testing.assert_allclose(f[0], f[10], atol=0)
        assert not np.allclose(f[0], f[20])
        np.testing.assert_allclose(np.linalg.norm(f[0]), 1.0, rtol=1e-5)


class TestViz:
    def test_skeleton_render_and_writers(self, tmp_path, rng):
        joints = rng.normal(size=(5, 55, 3)).astype(np.float32) * 0.3
        frames = render_skeleton_frames(joints, image_size=64)
        assert len(frames) == 5 and frames[0].size == (64, 64)

        tiled = grid_layout([frames, frames, frames])
        assert tiled[0].size == (128, 128)

        gif = tmp_path / "out.gif"
        save_gif(frames, str(gif))
        assert gif.stat().st_size > 100

        avi = tmp_path / "out.avi"
        save_mjpeg_avi(frames, str(avi))
        data = avi.read_bytes()
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        assert b"movi" in data and b"MJPG" in data

    def test_render_tool(self, tmp_path, rng):
        joints = rng.normal(size=(4, 55, 3)).astype(np.float32) * 0.3
        rt = RenderTool(str(tmp_path), image_size=64)
        p = rt.render_sequences([joints, joints], "demo")
        assert os.path.exists(p)
