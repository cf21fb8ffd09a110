"""SHOW-dataset preprocessing: SMPL-X pkl clips -> cached feature arrays.

Capability of the reference's ``SmplxDataset._load_them_all``
(``data_utils/mesh_dataset.py:38-366``): per clip,
  * torch-pickled SMPL-X params -> 99-d axis-angle pose
    [jaw | leye | reye | global_orient | body(63) | lhand PCA(12) | rhand PCA(12)]
  * hand PCA -> 45-d per hand via the first 12 rows of the dataset's PCA
    basis (``data_utils/hand_component.json``) -> 165-d pose
  * axis-angle -> 6d rotation (330-d) + 100-d expression = 430 channels
  * audio features (mfcc / mel / wav2vec) at motion fps

Results are plain float32 numpy arrays cached to .npz — the analogue of the
reference's ``<split>_6d_wv2.pkl`` cache (``dataloader_torch.py:75-88``).
Everything here is one-time host-side preprocessing.
"""

from __future__ import annotations

import io
import json
import os
import pickle
from typing import Optional

import numpy as np

from probtalk_tpu.data import audio as audio_lib


# ---------------------------------------------------------------------------
# torch-pickle loading without CUDA
# ---------------------------------------------------------------------------

def load_torch_pickle(path: str) -> dict:
    """Load the SHOW per-clip pkl (contains torch CUDA tensors) on CPU."""
    import torch

    class _CpuUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module == "torch.storage" and name == "_load_from_bytes":
                return lambda b: torch.load(
                    io.BytesIO(b), map_location="cpu", weights_only=False
                )
            return super().find_class(module, name)

    with open(path, "rb") as f:
        d = _CpuUnpickler(f).load()

    out = {}
    for k, v in d.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# pose assembly
# ---------------------------------------------------------------------------

_HAND_COMP_CACHE: dict = {}


def load_hand_components(path: str):
    if path not in _HAND_COMP_CACHE:
        with open(path) as f:
            comp = json.load(f)
        _HAND_COMP_CACHE[path] = (
            np.asarray(comp["left"], np.float32),
            np.asarray(comp["right"], np.float32),
        )
    return _HAND_COMP_CACHE[path]


def assemble_pose99(clip: dict) -> np.ndarray:
    """Raw SHOW params -> (T, 99) [jaw|leye|reye|go|body63|lhandPCA|rhandPCA]."""
    t = clip["jaw_pose"].shape[0]
    return np.concatenate(
        [
            clip["jaw_pose"].reshape(t, 3),
            clip["leye_pose"].reshape(t, 3),
            clip["reye_pose"].reshape(t, 3),
            clip["global_orient"].reshape(t, 3),
            clip["body_pose_axis"].reshape(t, 63),
            clip["left_hand_pose"].reshape(t, -1)[:, :12],
            clip["right_hand_pose"].reshape(t, -1)[:, :12],
        ],
        axis=-1,
    ).astype(np.float32)


def expand_hands(pose99: np.ndarray, hand_component_path: str) -> np.ndarray:
    """(T, 99) -> (T, 165): hand PCA coefficients -> 45-d axis-angle per hand
    (reference mesh_dataset.py:31-35)."""
    lc, rc = load_hand_components(hand_component_path)
    lhand = pose99[:, 75:87] @ lc[:12]
    rhand = pose99[:, 87:99] @ rc[:12]
    return np.concatenate([pose99[:, :75], lhand, rhand], axis=-1)


def pose_to_6d(pose165: np.ndarray) -> np.ndarray:
    """(T, 165) axis-angle -> (T, 330) 6d (jit-compiled batch convert)."""
    import jax.numpy as jnp
    from probtalk_tpu.core.rotation import aa_to_6d_flat

    return np.asarray(aa_to_6d_flat(jnp.asarray(pose165)), np.float32)


def pose_6d_to_3d(pose330: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp
    from probtalk_tpu.core.rotation import d6_to_aa_flat

    return np.asarray(d6_to_aa_flat(jnp.asarray(pose330)), np.float32)


# ---------------------------------------------------------------------------
# clip preprocessing
# ---------------------------------------------------------------------------

def preprocess_clip(
    motion_path: str,
    audio_path: Optional[str],
    hand_component_path: str,
    convert_to_6d: bool = True,
    fps: float = 30.0,
    audio_sr: int = 16000,
    audio_feat: str = "mfcc",
    audio_feat_dim: int = 64,
    wav2vec_fn=None,
) -> dict:
    """-> {'poses' (T, 330|165), 'expression' (T, 100), 'betas' (300,),
           'aud_feat' (T, Ca)} all float32, time-aligned at motion fps."""
    clip = load_torch_pickle(motion_path)
    pose = expand_hands(assemble_pose99(clip), hand_component_path)
    if convert_to_6d:
        pose = pose_to_6d(pose)
    t = pose.shape[0]
    expression = clip["expression"].reshape(t, -1).astype(np.float32)
    betas = clip["betas"].reshape(-1).astype(np.float32)

    out = {"poses": pose, "expression": expression, "betas": betas}

    if audio_path is not None:
        wav = audio_lib.load_wav(audio_path, target_sr=audio_sr)
        if audio_feat == "mfcc":
            feat = audio_lib.mfcc(wav, sr=audio_sr, n_mfcc=audio_feat_dim, fps=fps)
        elif audio_feat == "mel":
            feat = audio_lib.log_mel(wav, sr=audio_sr,
                                     hop=int(round(audio_sr / fps)),
                                     n_mels=audio_feat_dim)
        elif audio_feat in ("wav2vec", "hubert", "speech2text"):
            # all ride the same last-hidden-state plug-in interface
            # (reference encoder_choice branch, data_utils/utils.py:162-176;
            # hubert: audio.hubert.make_hubert_feature_fn, 1024-d;
            # speech2text: audio.speech2text.make_s2t_feature_fn)
            assert wav2vec_fn is not None, f"pass a {audio_feat} feature fn"
            feat = np.asarray(wav2vec_fn(wav))
        else:
            raise ValueError(audio_feat)
        out["aud_feat"] = audio_lib.interp_features_to_fps(feat, t)
        # onset times (seconds) for beat-consistency eval — the reference
        # computes these per clip at eval time (test_holisticbody.py:319)
        out["onset_times"] = np.asarray(
            audio_lib.onset_times(wav, sr=audio_sr), np.float32)
    return out


def compute_norm_stats(poses_list, expression_list) -> tuple[np.ndarray, np.ndarray]:
    """Per-channel mean/std with the reference's joint-averaged scheme
    (``dataloader_torch.py:265-294``): rotation stats are averaged over the
    55 joints and repeated (one mean/std per 6d/3d sub-channel), expression
    stats are per-channel. Returns (mean (C,), std (C,)), C = 430 in 6d."""
    poses = np.concatenate(poses_list, axis=0)       # (N, 330)
    expr = np.concatenate(expression_list, axis=0)   # (N, 100)
    d = 6 if poses.shape[1] % 6 == 0 and poses.shape[1] // 55 == 6 else 3
    per_joint = poses.reshape(-1, 55, d)
    mean_d = per_joint.mean(axis=(0, 1))             # (d,)
    std_d = per_joint.std(axis=(0, 1))
    pose_mean = np.tile(mean_d, 55)
    pose_std = np.tile(std_d, 55)
    e_mean = expr.mean(axis=0)
    e_std = expr.std(axis=0)
    mean = np.concatenate([pose_mean, e_mean]).astype(np.float32)
    std = np.concatenate([pose_std, e_std]).astype(np.float32)
    std = np.maximum(std, 1e-6)
    return mean, std


def load_norm_stats(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Load the pinned reference stats fixture (``data_utils/norm_stats.npy``,
    shape (2, 1, 1, 430)) -> (mean (430,), std (430,))."""
    s = np.load(path, allow_pickle=True)
    return (np.asarray(s[0], np.float32).reshape(-1),
            np.asarray(s[1], np.float32).reshape(-1))
