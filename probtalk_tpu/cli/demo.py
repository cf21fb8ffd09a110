"""Demo CLI: one audio file -> holistic SMPL-X motion (.npy, optional video).

Capability of the reference's ``scripts/demo.py``: load a wav, extract
motion-fps audio features, run the two-stage pipeline in sliding windows,
denormalize, convert 6d -> axis-angle, splice the canned lower body, save
the motion, and (with an SMPL-X model npz) render a skeleton video.

Runs out of the box: with no checkpoints given the stages are random-init
(shape-complete smoke path); pass --model_path (VQ) and --body_model_path
(predictor ckpt dir, refiner ckpt dir) to use trained weights.

    python -m probtalk_tpu.cli.demo --config_file configs/transformer.json \
        --audio_file <wav> --id 1 --num_sample 2
"""

from __future__ import annotations

import os

import numpy as np


def build_pipeline(config, norm_stats_path: str, vq_path=None,
                   predictor_path=None, refiner_path=None, seed: int = 0,
                   stage_dtype=None):
    """Construct the three stages (+ restore checkpoints when given).

    stage_dtype: compute dtype for the predictor/refiner transformer
    stacks (weights stay f32 in the restored states; norms/softmax stay
    f32 inside the modules). bf16 is the measured-best serving config at
    lanes>=64 (SERVE_SWEEP.json); default None (f32) keeps eval/demo
    parity paths bit-stable.
    """
    import jax
    import jax.numpy as jnp
    from probtalk_tpu.core import body_parts
    from probtalk_tpu.data.preprocess import load_norm_stats
    from probtalk_tpu.models.vqvae import VQVAE
    from probtalk_tpu.pipeline import HolisticPipeline
    from probtalk_tpu.train.stages import PredictorStage, RefinerStage
    from probtalk_tpu.train.state import create_train_state, adamw
    from probtalk_tpu.train.trainer import Checkpointer

    m = config.Model
    cm = body_parts.full_dim(True)
    groups = m.get("groups", 4)
    aud_dim = config.Data.aud.get("aud_feat_dim", 64)
    window = config.Data.pose.get("generate_length", 180)

    vq = VQVAE(in_dim=cm, embedding_dim=m.get("code_dim", 128) * groups,
               num_codes=m.get("code_num", 128), groups=groups,
               hiddens=m.get("hiddens", 1024), res_layers=m.get("res_layers", 2))
    x0 = jnp.zeros((1, window, cm), jnp.float32)
    vq_state = create_train_state(vq, (x0,), jax.random.key(seed), adamw(1e-4),
                                  init_kwargs={"train": True})
    if vq_path and os.path.exists(vq_path):
        restored, _ = Checkpointer(vq_path).restore(vq_state)
        if restored is not None:
            vq_state = restored
    vq_vars = {"params": vq_state.params, **vq_state.mutables}

    pred = PredictorStage(mot_dim=cm, num_code=m.get("code_num", 128),
                          groups=groups, maskgit_T=m.get("maskgit_T", 8),
                          aud_dim=aud_dim, dtype=stage_dtype)
    mask0 = jnp.zeros((1, window, 1), jnp.float32)

    def down3(n):
        for _ in range(3):
            n = (n - 2) // 2 + 1
        return n

    codes0 = jnp.zeros((1, down3(window), groups), jnp.int32)
    spk0 = jnp.zeros((1,), jnp.int32)
    aud0 = jnp.zeros((1, window, aud_dim), jnp.float32)
    pred_state = create_train_state(pred, (x0, codes0, mask0, spk0, aud0),
                                    jax.random.key(seed + 1), adamw(1e-4),
                                    init_kwargs={"train": True})
    if predictor_path and os.path.exists(predictor_path):
        restored, _ = Checkpointer(predictor_path).restore(pred_state)
        if restored is not None:
            pred_state = restored

    ref = RefinerStage(in_dim=cm, aud_dim=aud_dim, dtype=stage_dtype)
    ref_state = create_train_state(ref, (x0, aud0, mask0, spk0),
                                   jax.random.key(seed + 2), adamw(1e-4),
                                   init_kwargs={"train": True})
    if refiner_path and os.path.exists(refiner_path):
        restored, _ = Checkpointer(refiner_path).restore(ref_state)
        if restored is not None:
            ref_state = restored

    mean, std = load_norm_stats(norm_stats_path)
    pipe = HolisticPipeline(vq, vq_vars, pred, pred_state, ref, ref_state,
                            window=window, overlap=30)
    return pipe, mean, std


def generate_motion(pipe, mean, std, audio_file: str, speaker_id: int,
                    num_sample: int, stand: bool = False, seed: int = 0,
                    aud_feat_dim: int = 64):
    """audio -> (B, T, 265) denormalized axis-angle motion + expression."""
    import jax
    import jax.numpy as jnp
    from probtalk_tpu.core import body_parts, normalize
    from probtalk_tpu.core.rotation import d6_to_aa_flat
    from probtalk_tpu.data import audio as audio_lib

    wav = audio_lib.load_wav(audio_file, target_sr=16000)
    n_frames = int(len(wav) / 16000 * 30)
    feat = audio_lib.mfcc(wav, sr=16000, n_mfcc=aud_feat_dim, fps=30)
    aud = audio_lib.interp_features_to_fps(feat, n_frames)

    speaker = jnp.full((num_sample,), speaker_id, jnp.int32)
    out = pipe.generate(jax.random.key(seed), jnp.asarray(aud), speaker,
                        B=num_sample)
    idx = body_parts.c_index(True)
    out = normalize.denormalize(out, mean, std, shape="fbhe", idx=idx)
    jaw_d = body_parts.each_dim(True)[0]
    d6 = out[..., : jaw_d + 270]
    expr = out[..., -100:]
    b, t, _ = d6.shape
    aa = d6_to_aa_flat(d6.reshape(-1, 276)).reshape(b, t, 138)
    full = body_parts.part2full(aa, stand=stand)   # (B, T, 165)
    motion = np.asarray(jnp.concatenate([full, expr], -1))
    print(f"generated {motion.shape} | pipeline fps={pipe.timers.fps:.1f}")
    return motion


def main(argv=None):
    from probtalk_tpu.cli.options import parse_args
    from probtalk_tpu.config import load_config

    args = parse_args(argv)
    config = load_config(args.config_file)
    if not args.audio_file:
        raise SystemExit("--audio_file is required")

    norm_stats = os.environ.get(
        "PROBTALK_NORM_STATS", "/root/reference/data_utils/norm_stats.npy")
    body_paths = args.body_model_path or [None, None]
    pipe, mean, std = build_pipeline(
        config, norm_stats, vq_path=args.model_path,
        predictor_path=body_paths[0],
        refiner_path=body_paths[1] if len(body_paths) > 1 else None,
    )
    motion = generate_motion(
        pipe, mean, std, args.audio_file, args.id, args.num_sample,
        stand=args.stand, aud_feat_dim=config.Data.aud.get("aud_feat_dim", 64),
    )
    out_dir = os.path.join(args.save_dir, "demo")
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.audio_file))[0]
    out_path = os.path.join(out_dir, f"{base}.npy")
    np.save(out_path, motion)
    print(f"saved {out_path}")

    smplx_npz = os.environ.get("smplx_npz_path")
    if smplx_npz and os.path.exists(smplx_npz):
        import jax.numpy as jnp
        from probtalk_tpu.smplx import load_smplx, smplx_forward
        from probtalk_tpu.smplx.lbs import smplx_joints
        from probtalk_tpu.viz import RenderTool

        model = load_smplx(smplx_npz)
        # the reference renders with the SPEAKER's betas read from a
        # sample clip (scripts/demo.py:46-66 get_betas); use the cached
        # clip's betas when a preprocessed cache is available
        betas = np.zeros(300, np.float32)
        cache = os.environ.get("PROBTALK_CACHE", "data/cache")
        if os.path.isdir(cache):
            import glob as _glob

            for npz_path in sorted(_glob.glob(os.path.join(cache, "*.npz"))):
                z = np.load(npz_path)
                if "betas" in z and int(z.get("speaker", -1)) == args.id:
                    betas = z["betas"].astype(np.float32)
                    break
        # mux the speech into the video (the reference's ffmpeg step,
        # visualise/rendering.py:213-238 — here a PCM 'auds' AVI stream)
        from probtalk_tpu.data import audio as audio_lib

        wav = audio_lib.load_wav(args.audio_file, target_sr=16000)
        rt = RenderTool(out_dir)
        if args.whole_body:
            # mesh video (reference RenderTool pyrender path,
            # visualise/rendering.py:96-238 -> viz/rasterize.py)
            m0 = jnp.asarray(motion[0])
            flat = m0.reshape(-1, m0.shape[-1])
            jaw, eyes = flat[:, 0:3], flat[:, 3:9]
            go, body = flat[:, 9:12], flat[:, 12:75]
            hands = flat[:, 75:165]
            pose = jnp.concatenate([go, body, jaw, eyes, hands], -1)
            out = smplx_forward(model, jnp.asarray(betas), flat[:, 165:265],
                                pose, return_verts=True)
            verts = np.asarray(out["vertices"])
            camera_path = None
            if getattr(args, "rotation_times", 0):
                from probtalk_tpu.viz.rasterize import view_rotation

                camera_path = view_rotation(args.rotation_times)
            video = rt.render_mesh_sequences([verts], np.asarray(model.faces),
                                             base + "_mesh", audio=wav,
                                             camera_path=camera_path)
        else:
            joints = np.asarray(smplx_joints(
                model, jnp.asarray(betas), jnp.asarray(motion)))
            video = rt.render_sequences(
                [joints[i] for i in range(len(joints))], base, audio=wav)
        print(f"rendered {video}")


if __name__ == "__main__":
    main()
