"""The training CLI dispatches EVERY trainable model family.

The reference's ``scripts/train.py`` trains whatever ``Model.model_name``
the config names (via ``nets/init_model.py``); this drives
``cli/train.main`` end-to-end (tiny real cache -> windows -> one epoch)
for each family beyond the three core stages.
"""

import json
import os

import pytest

CLIP_ROOT = "/root/reference/demo_audio"
HANDS = "/root/reference/data_utils/hand_component.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CLIP_ROOT), reason="SHOW demo clips not mounted")


@pytest.fixture(scope="module")
def tiny_cache(tmp_path_factory):
    from probtalk_tpu.cli.data_build import build_cache

    cache = str(tmp_path_factory.mktemp("cache"))
    build_cache(CLIP_ROOT, cache, ["oliver"], HANDS, audio_feat="mfcc",
                max_clips=1)
    return cache


def _run(tmp_path, tiny_cache, model_block, gen_len=32, data_over=None):
    cfg = {
        "Data": {
            "cache_dir": tiny_cache,
            "pose": {"generate_length": gen_len, "convert_to_6d": True,
                     "normalization": True, "pose_dim": 99,
                     "expression": True},
            "aud": {"feat_method": "mfcc", "aud_feat_dim": 64},
            **(data_over or {}),
        },
        "DataLoader": {"batch_size": 4, "prefetch": 0},
        "Train": {"epochs": 1, "max_gradient_norm": 5,
                  "learning_rate": {"generator_learning_rate": 1e-4}},
        "Log": {"save_every": 1, "print_every": 1,
                "name": model_block["model_name"]},
        "Model": model_block,
    }
    p = tmp_path / f"{model_block['model_name']}.json"
    p.write_text(json.dumps(cfg))

    from probtalk_tpu.cli.train import main

    main(["--config_file", str(p), "--save_dir", str(tmp_path / "exp"),
          "--batch_size", "4", "--epochs", "1", "--num_devices", "1"])
    runs = list((tmp_path / "exp").glob("**/train.log"))
    assert runs, "no train dir written"


@pytest.mark.parametrize("model_block", [
    {"model_name": "s2g_face"},
    {"model_name": "emb_net"},
    {"model_name": "s2g_body_vq", "code_num": 64},
    {"model_name": "s2g_body_pixel", "code_num": 64},
    {"model_name": "s2g_body_ae"},
    {"model_name": "speech2gesture", "gan": True},
    {"model_name": "Audio2Gestures", "audio_hidden_size": 16,
     "pose_hidden_size": 16, "dropout": 0.0},
    {"model_name": "s2g_LS3DCG", "gan": False},
], ids=lambda m: m["model_name"])
def test_family_trains_one_epoch(tmp_path, tiny_cache, model_block):
    _run(tmp_path, tiny_cache, model_block)
