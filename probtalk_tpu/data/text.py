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
available. When no weights exist, ``make_text_embed_fn`` FAILS LOUDLY
(MissingTextWeightsError) unless the hash fallback is explicitly opted
into — hash embeddings keep shapes production-true but carry no
semantics, and silently training on them is a quality cliff.
"""

from __future__ import annotations

import hashlib
import re
from typing import Callable, List, Optional, Tuple

import numpy as np

TEXT_DIMS = {"gpt2": 768, "bert": 768, "t5": 768, "clip": 512, "ton": 3}

_LINE = re.compile(
    r"^\s*([\d.]+)\s*\|\s*([\d.]+)\s*\|\s*(.+?)\s*\|\s*([\d.]+)%?\s*$"
)
_SENT = re.compile(r"(?<=Transcript: ).*")


def parse_transcript(path: str, with_confidence: bool = False):
    """-> [(start_sec, end_sec, word), ...] over all transcript sections;
    with_confidence adds the per-word confidence in [0, 1] as a 4th
    element (the reference scales features by it, get_textfeat_bin)."""
    words = []
    with open(path, errors="replace") as f:
        for line in f:
            m = _LINE.match(line)
            if m:
                item = (float(m.group(1)), float(m.group(2)),
                        m.group(3).strip())
                if with_confidence:
                    item += (float(m.group(4)) / 100.0,)
                words.append(item)
    return words


def parse_sentences(path: str):
    """-> [(sentence, [(start, end, word, confidence), ...]), ...] — each
    'Transcript:' section with its timed words (foundation_models
    get_textfeat_bin parses the same structure)."""
    sents: List = []
    with open(path, errors="replace") as f:
        for line in f:
            s = _SENT.findall(line)
            if s:
                sents.append((s[0].strip(), []))
                continue
            m = _LINE.match(line)
            if m and sents:
                sents[-1][1].append((float(m.group(1)), float(m.group(2)),
                                     m.group(3).strip(),
                                     float(m.group(4)) / 100.0))
    return sents


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


class MissingTextWeightsError(RuntimeError):
    """A config selected a pretrained text encoder but no weights exist.

    The reference downloads gpt2/bert/clip/t5 from the HF hub
    (foundation_models.py:46-110); this environment has no egress, so
    silently degrading to hash noise would train a quality cliff without
    failing. Opt in explicitly with allow_hash=True (or choice='hash')."""


def _warn_hash(choice: str):
    import warnings

    warnings.warn(
        f"text encoder '{choice}' has no pretrained weights here; using the "
        "deterministic HASH fallback — text conditioning carries no "
        "semantics (opt-in via allow_hash/text_fallback='hash')",
        stacklevel=3)


def make_text_embed_fn(choice: str, variables=None, allow_hash: bool = False,
                       dim: Optional[int] = None, **model_kw):
    """-> (embed_fn(word)->(dim,), dim) for a config's text-model choice
    (the reference's text branch of getFM, foundation_models.py:46-110).

    choice: 'gpt2' | 'bert' | 'clip' | 't5' | 'hash'. Pretrained choices
    REQUIRE weights: pass ``variables`` (flax, from the matching
    ``probtalk_tpu.text`` converter) or have the HF torch weights cached
    locally; otherwise raises MissingTextWeightsError unless
    ``allow_hash=True``, which degrades loudly (a warning per call site
    use) to ``hash_embed``.
    """
    dim = dim or TEXT_DIMS.get(choice, 768)
    if choice == "hash":
        return (lambda w: hash_embed(w, dim)), dim
    if choice == "gpt2" and variables is not None:
        from probtalk_tpu.text.gpt2 import make_gpt2_embed_fn

        return make_gpt2_embed_fn(variables, dim=dim, **model_kw), dim
    if choice in ("bert", "clip", "t5") and variables is not None:
        from probtalk_tpu.text.encoders import make_text_encoder_embed_fn

        return make_text_encoder_embed_fn(choice, variables, dim=dim,
                                          **model_kw), dim
    # no flax variables: try locally cached HF torch weights
    try:
        hf_name = {"gpt2": "gpt2", "bert": "bert-base-uncased",
                   "clip": "openai/clip-vit-base-patch32",
                   "t5": "t5-base"}[choice]
    except KeyError:
        raise ValueError(f"unknown text encoder choice {choice!r}")
    try:
        return make_hf_embed_fn(hf_name), dim
    except Exception:
        if not allow_hash:
            raise MissingTextWeightsError(
                f"text encoder {choice!r} selected but neither flax "
                "variables nor local HF weights are available; pass "
                "allow_hash=True (config text_fallback='hash') to "
                "explicitly accept hash embeddings") from None
        _warn_hash(choice)
        return (lambda w: hash_embed(w, dim)), dim


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


def text_features_tokens(sentences, n_frames: int, fps: float = 30.0,
                         encode_fn: Optional[Callable] = None,
                         tokenize_fn: Optional[Callable] = None,
                         dim: int = 768,
                         pad_vector: Optional[np.ndarray] = None) -> np.ndarray:
    """(T, dim) token-level text features — the reference's
    ``get_textfeat_bin`` (foundation_models.py:229-335): each sentence is
    encoded WHOLE (tokens see full sentence context), each word's frame
    interval is split into one sub-interval per token, each sub-interval
    carries that token's hidden state scaled by the word's confidence;
    every frame not covered by a word gets ``pad_vector`` (zeros when
    None).

    sentences: from ``parse_sentences``. encode_fn(list_of_token_ids) ->
    (n_tokens, dim) hidden states (e.g. the flax GPT-2 last hidden
    states); tokenize_fn(word) -> list[int].
    """
    if tokenize_fn is None:
        tokenize_fn = lambda w: ([b % 50257 for b in w.lower().encode()]
                                 or [0])
    if encode_fn is None:
        _warn_hash("(default token encode_fn)")

        def encode_fn(ids):
            return np.stack([hash_embed(str(i), dim) for i in ids])
    feat = np.zeros((n_frames, dim), np.float32)
    covered = np.zeros(n_frames, bool)
    for sentence, words in sentences:
        if not sentence or not words:
            continue
        tok_per_word = [tokenize_fn(w) for _, _, w, _ in words]
        flat = [t for toks in tok_per_word for t in toks]
        states = np.asarray(encode_fn(flat), np.float32)
        k = 0
        for (s, e, _w, conf), toks in zip(words, tok_per_word):
            n = len(toks)
            fs = max(int(np.floor(s * fps)), 0)
            fe = min(max(int(np.ceil(e * fps)), fs + 1), n_frames)
            if fs >= n_frames:
                k += n
                continue
            edges = np.linspace(fs, fe, n + 1).astype(int)
            for j in range(n):
                a, b = edges[j], max(edges[j + 1], edges[j] + 1)
                feat[a:min(b, n_frames)] = states[k + j] * conf
                covered[a:min(b, n_frames)] = True
            k += n
    if pad_vector is not None:
        feat[~covered] = pad_vector
    return feat


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
        _warn_hash("(default word embed_fn)")
        embed_fn = lambda w: hash_embed(w, dim)
    feat = np.zeros((n_frames, dim), np.float32)
    cache: dict = {}
    for fs, fe, w in word_frame_intervals(words, n_frames, fps):
        if w not in cache:
            cache[w] = embed_fn(w)
        feat[fs:fe] = cache[w]
    return feat
