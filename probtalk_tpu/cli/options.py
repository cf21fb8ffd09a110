"""CLI flag surface mirroring the reference's ``trainer/options.py:3-37``."""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="probtalk_tpu")
    p.add_argument("--gpu", type=str, default="", help="unused on TPU; kept for CLI parity")
    p.add_argument("--save_dir", type=str, default="experiments")
    p.add_argument("--exp_name", type=str, default="probtalk_tpu")
    p.add_argument("--speakers", type=str, nargs="+",
                   default=["oliver", "chemistry", "seth", "conan"])
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--config_file", type=str, default="configs/transformer.json")
    # Tmpt/S2G template flags (reference options.py:13-15). Accepted for
    # CLI parity only — in the reference too, the template path is driven
    # by config.Model.use_template/template_length (speech2gesture.py:354),
    # never by these args; configure templates via the model config.
    p.add_argument("--use_template", action="store_true")
    p.add_argument("--template_length", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--pretrained_pth", type=str, default=None)
    p.add_argument("--style_layer_norm", action="store_true")
    p.add_argument("--infer", action="store_true")
    p.add_argument("--data_root", type=str, default=None,
                   help="overrides config Data.data_root")
    p.add_argument("--model_name", type=str, default=None)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--body_model_name", type=str, nargs="+", default=None)
    p.add_argument("--body_model_path", type=str, nargs="+", default=None)
    p.add_argument("--face_model_name", type=str, default=None)
    p.add_argument("--face_model_path", type=str, default=None)
    p.add_argument("--audio_file", type=str, default=None)
    p.add_argument("--speaker", type=str, default="oliver",
                   help="oliver, chemistry, seth, conan (options.py:25)")
    p.add_argument("--id", type=int, default=0, help="speaker id for demo")
    p.add_argument("--num_sample", type=int, default=1)
    p.add_argument("--only_face", action="store_true")
    p.add_argument("--stand", action="store_true")
    p.add_argument("--whole_body", action="store_true")
    p.add_argument("--rotation_times", type=int, default=0,
                   help="demo mesh video view rotation in 45-degree steps "
                        "(the reference's _render_change_view)")
    p.add_argument("--epochs", type=int, default=None,
                   help="overrides config Train.epochs")
    p.add_argument("--batch_size", type=int, default=None,
                   help="overrides config DataLoader.batch_size")
    p.add_argument("--num_devices", type=int, default=None,
                   help="mesh size; default all visible devices")
    p.add_argument("--loader", type=str, default="device",
                   choices=["device", "native", "python"],
                   help="batch producer: 'device' = HBM-resident corpus "
                        "(index-only steps; falls back to native if the "
                        "corpus exceeds HBM), 'native' = C++ double-buffered "
                        "producer (the reference DataLoader(workers=8) "
                        "role), 'python' = WindowedDataset. All three are "
                        "bit-identical (tests/test_device_dataset.py)")
    return p.parse_args(argv)
