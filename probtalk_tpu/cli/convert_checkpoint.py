"""Turnkey migration: torch reference checkpoint -> orbax checkpoint.

    python -m probtalk_tpu.cli.convert_checkpoint \
        --torch_ckpt experiments/.../ckpt-99.pth --stage vqt --out ckpt_dir

Stages: vqt (s2g_body_vqt), predictor, refiner, legacy_vq (s2g_body_vq),
wav2vec2 / hubert (a HuggingFace ``*Model`` state dict -> the flax
acoustic frontend, e.g. for ``cli/serve.py --pcm --w2v_ckpt``).
The converted variables load into the matching probtalk_tpu stage; golden
parity of the conversion is enforced by tests/test_torch_parity*.py.
"""

from __future__ import annotations

import argparse
import os


def convert(torch_ckpt: str, stage: str, out_dir: str, groups: int = 4):
    import jax
    import orbax.checkpoint as ocp
    from probtalk_tpu.convert import torch_checkpoint as tc

    if stage in ("wav2vec2", "hubert"):
        import torch

        from probtalk_tpu.audio.wav2vec2 import convert_hf_wav2vec2

        sd = torch.load(torch_ckpt, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        # both families use 64-d heads: base 768/12, large 1024/16
        dim = int(sd["feature_projection.projection.bias"].shape[0])
        variables = convert_hf_wav2vec2(sd, heads=dim // 64)
        path = os.path.abspath(out_dir)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, "variables"), variables)
        ckptr.wait_until_finished()
        print(f"converted {stage} -> {path}/variables")
        return variables

    gen = tc.load_reference_checkpoint(torch_ckpt)
    if stage == "vqt":
        variables = tc.convert_vqvae(gen["VQ"] if "VQ" in gen else gen,
                                     groups=groups)
    elif stage == "predictor":
        variables = tc.convert_predictor_stage(gen)
    elif stage == "refiner":
        variables = tc.convert_refiner_stage(gen)
    elif stage == "legacy_vq":
        variables = tc.convert_legacy_vqvae(gen.get("generator", gen))
    else:
        raise SystemExit(f"unknown stage {stage!r}")

    path = os.path.abspath(out_dir)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "variables"), variables)
    ckptr.wait_until_finished()
    print(f"converted {stage} -> {path}/variables")
    return variables


def main(argv=None):
    # checkpoint conversion is a host-only transform: pin CPU so the
    # per-tensor device_puts/orbax fetch never ride the TPU tunnel (and
    # never contend for the single-holder TPU with a live train/serve)
    import jax

    jax.config.update("jax_platforms", "cpu")
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--stage", required=True,
                   choices=["vqt", "predictor", "refiner", "legacy_vq",
                            "wav2vec2", "hubert"])
    p.add_argument("--out", required=True)
    p.add_argument("--groups", type=int, default=4)
    args = p.parse_args(argv)
    convert(args.torch_ckpt, args.stage, args.out, args.groups)


if __name__ == "__main__":
    main()
