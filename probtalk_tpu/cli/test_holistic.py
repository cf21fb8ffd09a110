"""Holistic evaluation CLI: the reference's ``scripts/test_holisticbody.py``.

Runs the complete metric suite (``probtalk_tpu.eval.harness``) over a
SHOW-layout data root: FGD (fe/bh/fbhe), BC, MAAC, MAD/MAJE/diversity,
face L2/LVD/diversity, and generation fps. Generation goes through the
compiled streaming scan so each clip is one XLA program on the device.

    python -m probtalk_tpu.cli.test_holistic \
        --config_file configs/transformer.json \
        --data_root /root/reference/demo_audio \
        --model_path <vq ckpt dir> \
        --body_model_path <predictor ckpt dir> <refiner ckpt dir>

Checkpoints are optional (random-init smoke run otherwise). The SMPL-X
joint metrics need a model npz: set ``smplx_npz_path`` env (real asset) or
pass ``--synthetic_smplx`` (structurally-identical synthetic fixture; see
probtalk_tpu/smplx/synthetic.py).
"""

from __future__ import annotations

import json
import os

import numpy as np

# re-exported for back-compat (the harness lived in this module in round 1)
from probtalk_tpu.eval.harness import run_harness, unfold_windows  # noqa: F401


def build_embedders(clips, mean, std, ckpt_dir=None, seed: int = 4):
    """Construct the three FGD embedders (fe/bh/fbhe) -> extract_fns dict.

    With ``ckpt_dir`` given, restores ``<ckpt_dir>/emb_{which}`` orbax
    checkpoints (the trio the reference loads from
    experiments/val_models/*, test_holisticbody.py:397-403); otherwise
    random-init (plumbing-only FGD).
    """
    import jax
    import jax.numpy as jnp
    from probtalk_tpu.core import body_parts
    from probtalk_tpu.models.embedding_net import EmbeddingNet
    from probtalk_tpu.train.state import create_train_state, adamw

    jaw_d = body_parts.each_dim(True)[0]
    exp_d = body_parts.each_dim(True)[3]
    full_d = body_parts.full_dim(True)

    def part_slice(which, w):
        if which == "fe":
            return np.concatenate([w[..., :jaw_d], w[..., -exp_d:]], -1)
        if which == "bh":
            return w[..., jaw_d:-exp_d]
        return w

    dims = {"fe": jaw_d + exp_d, "bh": full_d - jaw_d - exp_d, "fbhe": full_d}
    extract_fns = {}
    for i, (which, dim) in enumerate(dims.items()):
        emb = EmbeddingNet(pose_dim=dim, n_frames=90)
        w0 = jnp.zeros((1, 90, dim), jnp.float32)
        state = create_train_state(emb, (w0,), jax.random.key(seed + i),
                                   adamw(1e-4), init_kwargs={"train": True})
        if ckpt_dir:
            from probtalk_tpu.train.trainer import Checkpointer

            path = os.path.join(ckpt_dir, f"emb_{which}")
            if os.path.isdir(path):
                restored, _ = Checkpointer(path).restore(state)
                if restored is not None:
                    state = restored
        emb_vars = {"params": state.params, **state.mutables}
        extract = jax.jit(lambda v, w, e=emb: e.apply(v, w, method=e.extract))

        def fn(w, extract=extract, emb_vars=emb_vars, which=which):
            return np.asarray(extract(emb_vars,
                                      jnp.asarray(part_slice(which, w))))

        extract_fns[which] = fn
    return extract_fns


def load_smplx_model(synthetic: bool = False):
    """SMPL-X model from env (real asset) or the synthetic fixture."""
    from probtalk_tpu.smplx import load_smplx, write_synthetic_smplx_npz

    yaml_path = os.environ.get(
        "extra_joint_path",
        "/root/reference/visualise/smplx/smplx_extra_joints.yaml")
    if not os.path.exists(yaml_path):
        yaml_path = None
    npz = os.environ.get("smplx_npz_path")
    if npz and os.path.exists(npz):
        return load_smplx(npz, extra_joints_yaml=yaml_path)
    if synthetic:
        path = "/tmp/probtalk_tpu_smplx_synth.npz"
        if not os.path.exists(path):
            write_synthetic_smplx_npz(path)
        return load_smplx(path, extra_joints_yaml=yaml_path)
    return None


def streaming_generate_fn(pipe):
    """Compiled whole-clip generation from a HolisticPipeline's stages."""
    from probtalk_tpu.streaming import make_streaming_generate

    return make_streaming_generate(
        pipe.vq_model, pipe.vq_variables, pipe.predictor_stage,
        pipe.predictor_state, pipe.refiner_stage, pipe.refiner_state,
        window=pipe.window, overlap=pipe.overlap)


def pipeline_generate_fn(pipe):
    """Window-replay generation (HolisticPipeline.generate) adapter."""
    def generate(key, aud, speaker):
        return pipe.generate(key, aud[0], speaker, B=aud.shape[0])

    return generate


def main(argv=None):
    from probtalk_tpu.cli.options import parse_args
    from probtalk_tpu.cli.data_build import build_cache, load_cached_clips
    from probtalk_tpu.cli.demo import build_pipeline
    from probtalk_tpu.config import load_config
    from probtalk_tpu.eval.fgd import FGDEvaluator

    args = parse_args(argv)
    config = load_config(args.config_file)
    data_root = args.data_root or config.Data.get(
        "data_root", "/root/reference/demo_audio")

    cache_dir = os.environ.get("PROBTALK_CACHE", "/tmp/ptlk_cache")
    hand_comp = os.environ.get(
        "PROBTALK_HAND_COMPONENT",
        "/root/reference/data_utils/hand_component.json")
    build_cache(data_root, cache_dir, args.speakers, hand_comp,
                audio_feat=config.Data.aud.get("feat_method", "mfcc"),
                audio_feat_dim=config.Data.aud.get("aud_feat_dim", 64))
    clips, mean, std = load_cached_clips(cache_dir)
    if not clips:
        raise SystemExit(f"no clips under {data_root}")

    norm_stats = os.environ.get(
        "PROBTALK_NORM_STATS", "/root/reference/data_utils/norm_stats.npy")
    body_paths = args.body_model_path or [None, None]
    pipe, _, _ = build_pipeline(
        config, norm_stats, vq_path=args.model_path,
        predictor_path=body_paths[0],
        refiner_path=body_paths[1] if len(body_paths) > 1 else None)

    embed_dir = args.pretrained_pth   # dir holding emb_{fe,bh,fbhe}
    evaluator = FGDEvaluator(build_embedders(clips, mean, std, embed_dir))
    smplx_model = load_smplx_model(synthetic=True)

    results = run_harness(
        streaming_generate_fn(pipe), clips, mean, std,
        evaluator=evaluator, smplx_model=smplx_model,
        B=args.num_sample if args.num_sample > 1 else 16,
        stand=args.stand)
    print(json.dumps(results, indent=2, default=float))

    out = os.path.join(args.save_dir, "holistic_eval.json")
    os.makedirs(args.save_dir, exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
