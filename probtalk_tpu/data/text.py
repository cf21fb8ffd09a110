"""Text features: transcript parsing, word-interval alignment, embeddings.

Capability of the reference's text branch of the foundation-model hub
(``data_utils/foundation_models.py:23-388``: ``get_textfeat``,
``talk_or_not``, ``split_interval`` / ``get_n_intervals``): per-frame text
feature arrays aligned to motion frames from word-interval transcripts.

The SHOW transcripts (.txt next to each wav) carry word timings:
    Transcript: Come in from the ocean.
      0.000 |   0.300 | Come | 97%
Word embeddings are pluggable (``embed_fn``): the flax GPT-2 encoder
(``probtalk_tpu.text.make_gpt2_embed_fn`` — the reference's default text
model, golden-parity'd vs HF torch), any HF text model (gpt2 / bert /
clip / t5 — dims per ``nets/base.py:114-129``) when its weights are
available, otherwise a deterministic hash-based fallback so the text
conditioning path stays shape-complete without downloads.
"""

from __future__ import annotations

import hashlib
import re
from typing import Callable, List, Optional, Tuple

import numpy as np

TEXT_DIMS = {"gpt2": 768, "bert": 768, "t5": 768, "clip": 512, "ton": 3}

_LINE = re.compile(
    r"^\s*([\d.]+)\s*\|\s*([\d.]+)\s*\|\s*(.+?)\s*\|\s*[\d.]+%?\s*$"
)


def parse_transcript(path: str) -> List[Tuple[float, float, str]]:
    """-> [(start_sec, end_sec, word), ...] over all transcript sections."""
    words = []
    with open(path, errors="replace") as f:
        for line in f:
            m = _LINE.match(line)
            if m:
                words.append((float(m.group(1)), float(m.group(2)),
                              m.group(3).strip()))
    return words


def word_frame_intervals(words, n_frames: int, fps: float = 30.0):
    """-> [(start_frame, end_frame, word)] clipped to [0, n_frames)."""
    out = []
    for s, e, w in words:
        fs = int(np.floor(s * fps))
        fe = int(np.ceil(e * fps))
        if fs >= n_frames:
            break
        out.append((max(fs, 0), min(max(fe, fs + 1), n_frames), w))
    return out


def talk_or_not(words, n_frames: int, fps: float = 30.0) -> np.ndarray:
    """(T, 3) features: [speaking, silent, word-onset] — the 'ton' text
    model surface (reference foundation_models.talk_or_not; text_d=3 per
    nets/base.py:122-123)."""
    feat = np.zeros((n_frames, 3), np.float32)
    feat[:, 1] = 1.0
    for fs, fe, _ in word_frame_intervals(words, n_frames, fps):
        feat[fs:fe, 0] = 1.0
        feat[fs:fe, 1] = 0.0
        feat[fs, 2] = 1.0
    return feat


def hash_embed(word: str, dim: int = 768) -> np.ndarray:
    """Deterministic pseudo-embedding: unit gaussian keyed by the word.
    A stand-in with the same interface/shape as an LM embedding."""
    seed = int.from_bytes(hashlib.sha1(word.lower().encode()).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def make_hf_embed_fn(model_name: str = "gpt2"):
    """Word-embedding fn backed by a HF torch model (used when weights are
    locally available; the reference loads gpt2/bert/clip/t5 the same way)."""
    from transformers import AutoModel, AutoTokenizer
    import torch

    tok = AutoTokenizer.from_pretrained(model_name)
    mod = AutoModel.from_pretrained(model_name)
    mod.eval()

    def embed(word: str) -> np.ndarray:
        with torch.no_grad():
            ids = tok(word, return_tensors="pt")
            out = mod(**ids).last_hidden_state[0]
        return out.mean(0).numpy().astype(np.float32)

    return embed


def make_flax_embed_fn(variables=None, model: str = "gpt2", **kw):
    """Word-embedding fn backed by the flax text encoder (TPU path).

    ``variables`` from ``text.gpt2.convert_hf_gpt2`` when a GPT-2
    checkpoint is locally available; random-init otherwise (still the
    exact architecture, so downstream shapes/compute are production-true).
    """
    if model != "gpt2":
        raise ValueError(f"flax text encoder implements gpt2; got {model}")
    from probtalk_tpu.text.gpt2 import make_gpt2_embed_fn

    return make_gpt2_embed_fn(variables, **kw)


def text_features(words, n_frames: int, fps: float = 30.0,
                  embed_fn: Optional[Callable] = None,
                  dim: int = 768) -> np.ndarray:
    """(T, dim) per-frame features: each frame carries its word's embedding,
    zeros during silence (the reference's interval-splat alignment in
    get_textfeat, foundation_models.py:*)."""
    if embed_fn is None:
        embed_fn = lambda w: hash_embed(w, dim)
    feat = np.zeros((n_frames, dim), np.float32)
    cache: dict = {}
    for fs, fe, w in word_frame_intervals(words, n_frames, fps):
        if w not in cache:
            cache[w] = embed_fn(w)
        feat[fs:fe] = cache[w]
    return feat
