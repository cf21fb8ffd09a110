"""Behavioral test of the CLI flag surface vs the reference's argparse.

PARITY.md's `trainer/options.py` row was previously verified only at
import level (VERDICT r3 weak #5); this asserts the actual surface: every
option string the reference's ``trainer/options.py:3-37`` parser exposes
must be accepted here, with matching arity (nargs='+' lists) and the
defaults train/demo scripts rely on.
"""

import pytest

from probtalk_tpu.cli.options import parse_args

# the reference parser's full option surface (trainer/options.py:3-37)
REFERENCE_FLAGS = {
    "--gpu", "--save_dir", "--exp_name", "--speakers", "--seed",
    "--model_name", "--use_template", "--template_length", "--resume",
    "--pretrained_pth", "--style_layer_norm", "--config_file",
    "--audio_file", "--speaker", "--only_face", "--stand", "--whole_body",
    "--num_sample", "--model_path", "--face_model_name", "--face_model_path",
    "--body_model_name", "--body_model_path", "--infer",
}


class TestOptionsSurface:
    def test_every_reference_flag_is_accepted(self):
        args = parse_args([
            "--gpu", "0", "--save_dir", "/tmp/x", "--exp_name", "e",
            "--speakers", "oliver", "seth", "--seed", "7",
            "--model_name", "s2g_body_vqt", "--use_template",
            "--template_length", "3", "--resume",
            "--pretrained_pth", "/tmp/p.ckpt", "--style_layer_norm",
            "--config_file", "configs/transformer.json",
            "--audio_file", "/tmp/a.wav", "--speaker", "conan",
            "--only_face", "--stand", "--whole_body", "--num_sample", "4",
            "--model_path", "/tmp/m", "--face_model_name", "s2g_face",
            "--face_model_path", "/tmp/f", "--body_model_name", "a", "b",
            "--body_model_path", "/tmp/1", "/tmp/2", "--infer",
        ])
        assert args.speakers == ["oliver", "seth"]
        assert args.seed == 7
        assert args.use_template and args.template_length == 3
        assert args.resume and args.style_layer_norm and args.infer
        assert args.body_model_name == ["a", "b"]          # nargs='+'
        assert args.body_model_path == ["/tmp/1", "/tmp/2"]
        assert args.speaker == "conan"
        assert args.num_sample == 4

    def test_reference_defaults(self):
        args = parse_args([])
        # defaults shared with the reference parser
        assert args.seed == 1                # options.py:9
        assert args.template_length == 0     # options.py:15
        assert args.num_sample == 1          # options.py:29
        assert args.speaker == "oliver"      # options.py:25
        assert not (args.resume or args.infer or args.use_template)
        assert args.pretrained_pth is None

    def test_flag_set_is_superset_of_reference(self):
        """No reference option may be missing from the rebuilt parser."""
        import probtalk_tpu.cli.options as opts
        import argparse

        captured = set()
        real_add = argparse.ArgumentParser.add_argument

        def spy(self, *a, **kw):
            for s in a:
                if isinstance(s, str) and s.startswith("--"):
                    captured.add(s)
            return real_add(self, *a, **kw)

        argparse.ArgumentParser.add_argument = spy
        try:
            opts.parse_args([])
        finally:
            argparse.ArgumentParser.add_argument = real_add
        missing = REFERENCE_FLAGS - captured
        assert not missing, f"reference flags missing: {sorted(missing)}"

    def test_unknown_flag_rejected(self):
        with pytest.raises(SystemExit):
            parse_args(["--definitely_not_a_flag"])
