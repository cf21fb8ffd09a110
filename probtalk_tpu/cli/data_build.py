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


def find_clips_split(data_root: str, split_npy: str):
    """The reference's ``dataset_load_mode='json'`` discovery
    (``data_utils/dataloader_torch.py:163-190``): entries of a pinned
    split .npy (``speaker/vid/clip``), with the reference's directory-name
    fallbacks (``__`` -> ``_`` -> ``_``->space) for renamed folders."""
    for item in np.load(split_npy).tolist():
        speaker, mid, clip = str(item).split("/")
        for mid_try in (mid, mid.replace("__", "_"), mid.replace("_", " ")):
            base = os.path.join(data_root, speaker, mid_try, clip, clip)
            if os.path.isfile(base + ".pkl") and os.path.isfile(base + ".wav"):
                yield speaker, f"{mid_try}__{clip}", base
                break


def find_clips_nested(data_root: str, speakers, split: str = "train",
                      clip_prefix: str = ""):
    """The reference's ``dataset_load_mode='old_json'`` discovery
    (``data_utils/dataloader_torch.py:91-160``): walk
    ``<root>/<speaker>/<vid>/<split>/<clip>/<clip>.{pkl,wav}``."""
    for sp in speakers:
        sp_dir = os.path.join(data_root, sp)
        if not os.path.isdir(sp_dir):
            continue
        for vid in sorted(os.listdir(sp_dir)):
            vid_pth = os.path.join(sp_dir, vid, split)
            if not os.path.isdir(vid_pth):
                continue
            for clip in sorted(os.listdir(vid_pth)):
                if clip_prefix and not clip.startswith(clip_prefix):
                    continue
                base = os.path.join(vid_pth, clip, clip)
                if os.path.isfile(base + ".pkl") and \
                        os.path.isfile(base + ".wav"):
                    yield sp, f"{vid}__{clip}", base


def build_cache(data_root: str, cache_dir: str, speakers, hand_component_path: str,
                audio_feat: str = "mfcc", audio_feat_dim: int = 64,
                convert_to_6d: bool = True, max_clips: int = None,
                text: str = None, text_variables=None,
                allow_hash: bool = False, audio_fn=None,
                layout: str = "flat", split_npy: str = None,
                split: str = "train"):
    """text: None | 'ton' | 'gpt2' | 'bert' | 'clip' | 't5' | 'hash' — adds
    per-frame text_feat from the clip transcript (reference get_textfeat,
    foundation_models.py:46-110). Pretrained choices raise
    MissingTextWeightsError without weights unless allow_hash.

    layout: clip discovery mode, mirroring the reference's three
    ``dataset_load_mode`` values (dataloader_torch.py:75-190):
      'flat'   — <root>/<speaker>/<clip>/<clip>.pkl (demo_audio; the
                 pickle-cache layout once built)
      'split'  — entries of ``split_npy`` (the reference 'json' mode)
      'nested' — <root>/<speaker>/<vid>/<split>/<clip>/ ('old_json')"""
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
    if layout == "flat":
        clip_iter = find_clips(data_root, speakers)
    elif layout == "split":
        clip_iter = find_clips_split(data_root, split_npy)
    elif layout == "nested":
        clip_iter = find_clips_nested(data_root, speakers, split)
    else:
        raise ValueError(layout)
    for sp, clip, base in clip_iter:
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
        if audio_feat in ("wav2vec", "hubert", "speech2text") \
                and audio_fn is None:
            # flax encoder at full architecture; random-init when no
            # checkpoint is vendored (converters exist for the HF weights)
            if audio_feat == "hubert":
                from probtalk_tpu.audio.hubert import make_hubert_feature_fn

                audio_fn = make_hubert_feature_fn()
            elif audio_feat == "speech2text":
                from probtalk_tpu.audio.speech2text import make_s2t_feature_fn

                audio_fn = make_s2t_feature_fn()
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
    p.add_argument("--layout", default="flat",
                   choices=["flat", "split", "nested"],
                   help="clip discovery: flat (demo_audio), split "
                        "(reference 'json' mode via --split_npy), nested "
                        "(reference 'old_json' mode)")
    p.add_argument("--split_npy", default=None,
                   help="split file for --layout split, e.g. "
                        "/root/reference/data_utils/split/val_split.npy")
    p.add_argument("--split", default="train",
                   help="split subdir for --layout nested")
    args = p.parse_args(argv)
    build_cache(args.data_root, args.cache_dir, args.speakers,
                args.hand_component, args.audio_feat,
                text=args.text, allow_hash=args.text_fallback == "hash",
                layout=args.layout, split_npy=args.split_npy,
                split=args.split)


if __name__ == "__main__":
    main()
