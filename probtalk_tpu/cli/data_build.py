"""Build the preprocessed dataset cache from a SHOW-layout data root.

Capability of the reference's first-run preprocessing inside
``MultiVidData.__init__`` (``data_utils/dataloader_torch.py:20-294``):
walk speakers/clips, preprocess each (pose 6d + audio features), cache as
.npz, compute normalization stats.

Layout expected: <data_root>/<speaker>/<clip>/<clip>.pkl + .wav
(the demo_audio folder follows it, so this also runs on the demo fixtures).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def find_clips(data_root: str, speakers):
    for sp in speakers:
        sp_dir = os.path.join(data_root, sp)
        if not os.path.isdir(sp_dir):
            continue
        for clip in sorted(os.listdir(sp_dir)):
            base = os.path.join(sp_dir, clip, clip)
            if os.path.exists(base + ".pkl"):
                yield sp, clip, base


def build_cache(data_root: str, cache_dir: str, speakers, hand_component_path: str,
                audio_feat: str = "mfcc", audio_feat_dim: int = 64,
                convert_to_6d: bool = True, max_clips: int = None,
                text: str = None, text_variables=None,
                allow_hash: bool = False, audio_fn=None):
    """text: None | 'ton' | 'gpt2' | 'bert' | 'clip' | 't5' | 'hash' — adds
    per-frame text_feat from the clip transcript (reference get_textfeat,
    foundation_models.py:46-110). Pretrained choices raise
    MissingTextWeightsError without weights unless allow_hash."""
    from probtalk_tpu.core.body_parts import SPEAKER_ID
    from probtalk_tpu.data.preprocess import preprocess_clip, compute_norm_stats
    from probtalk_tpu.data import text as text_lib

    embed_fn = text_dim = None
    if text not in (None, "none", "ton"):
        # resolve ONCE, loudly, before any clip work
        embed_fn, text_dim = text_lib.make_text_embed_fn(
            text, variables=text_variables, allow_hash=allow_hash)

    os.makedirs(cache_dir, exist_ok=True)
    poses_all, expr_all = [], []
    count = 0
    for sp, clip, base in find_clips(data_root, speakers):
        if max_clips is not None and count >= max_clips:
            break
        out_path = os.path.join(cache_dir, f"{sp}__{clip}.npz")
        if os.path.exists(out_path):
            cached = np.load(out_path)
            poses_all.append(cached["poses"])
            expr_all.append(cached["expression"])
            count += 1
            continue
        wav = base + ".wav" if os.path.exists(base + ".wav") else None
        if audio_feat in ("wav2vec", "hubert") and audio_fn is None:
            # flax encoder at full architecture; random-init when no
            # checkpoint is vendored (converters exist for the HF weights)
            if audio_feat == "hubert":
                from probtalk_tpu.audio.hubert import make_hubert_feature_fn

                audio_fn = make_hubert_feature_fn()
            else:
                from probtalk_tpu.audio.wav2vec2 import make_wav2vec_feature_fn

                audio_fn = make_wav2vec_feature_fn()
        out = preprocess_clip(base + ".pkl", wav, hand_component_path,
                              convert_to_6d=convert_to_6d,
                              audio_feat=audio_feat,
                              audio_feat_dim=audio_feat_dim,
                              wav2vec_fn=audio_fn)
        out["speaker"] = np.int32(SPEAKER_ID.get(sp, 0))
        if text not in (None, "none"):
            n_frames = out["poses"].shape[0]
            txt_path = base + ".txt"
            words = (text_lib.parse_transcript(txt_path)
                     if os.path.exists(txt_path) else [])
            if text == "ton":
                out["text_feat"] = text_lib.talk_or_not(words, n_frames)
            else:
                out["text_feat"] = text_lib.text_features(
                    words, n_frames, embed_fn=embed_fn, dim=text_dim)
        np.savez(out_path, **out)
        poses_all.append(out["poses"])
        expr_all.append(out["expression"])
        count += 1
        print(f"cached {sp}/{clip}")
    if poses_all:
        mean, std = compute_norm_stats(poses_all, expr_all)
        np.savez(os.path.join(cache_dir, "norm_stats.npz"), mean=mean, std=std)
    print(f"{count} clips cached to {cache_dir}")


def load_cached_clips(cache_dir: str):
    """-> (list[ClipData], mean, std) from a built cache."""
    from probtalk_tpu.data.dataset import ClipData

    clips = []
    for fn in sorted(os.listdir(cache_dir)):
        if not fn.endswith(".npz") or fn == "norm_stats.npz":
            continue
        z = np.load(os.path.join(cache_dir, fn))
        clips.append(ClipData(
            poses=z["poses"], expression=z["expression"],
            aud_feat=z["aud_feat"] if "aud_feat" in z else
            np.zeros((z["poses"].shape[0], 64), np.float32),
            betas=z["betas"], speaker=int(z["speaker"]) if "speaker" in z else 0,
            name=fn[:-4],
            onset_times=z["onset_times"] if "onset_times" in z else None,
            text_feat=z["text_feat"] if "text_feat" in z else None,
        ))
    stats = np.load(os.path.join(cache_dir, "norm_stats.npz"))
    return clips, stats["mean"], stats["std"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--cache_dir", required=True)
    p.add_argument("--speakers", nargs="+",
                   default=["oliver", "chemistry", "seth", "conan"])
    p.add_argument("--hand_component", default="/root/reference/data_utils/hand_component.json")
    p.add_argument("--audio_feat", default="mfcc")
    p.add_argument("--text", default=None,
                   help="ton|gpt2|bert|clip|t5|hash text features "
                        "(pretrained choices need weights)")
    p.add_argument("--text_fallback", default=None, choices=[None, "hash"],
                   help="explicit opt-in to hash embeddings when the "
                        "chosen text encoder has no weights")
    args = p.parse_args(argv)
    build_cache(args.data_root, args.cache_dir, args.speakers,
                args.hand_component, args.audio_feat,
                text=args.text, allow_hash=args.text_fallback == "hash")


if __name__ == "__main__":
    main()
