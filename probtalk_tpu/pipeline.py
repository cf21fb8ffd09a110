"""All-in-one inference: compose face + predictor + refiner into the full
audio -> holistic SMPL-X motion pipeline.

Capability of the reference's ``nets/ai1.py`` (All_In_One_Model) plus the
windowed generation schedules of ``scripts/demo.py:116-178`` (180-frame
predictor windows / 30 overlap, 176-frame refiner windows) and
``scripts/test_holisticbody.py:240-261`` (sliding 180-then-150 windows with
generated-context feedback).

TPU-first: every window size is static, so each stage compiles exactly once
and the window loop replays compiled executables; the B diversity samples
ride the batch axis (shardable over the mesh 'data' axis for
sample-parallel inference).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from probtalk_tpu.core import body_parts
from probtalk_tpu.train.stages import (
    PredictorStage, RefinerStage, make_predictor_infer_fn, make_refiner_infer_fn,
)
from probtalk_tpu.utils.interp import resize_time


@dataclass
class PipelineTimers:
    predictor: float = 0.0
    refiner: float = 0.0
    face: float = 0.0
    frames: int = 0

    @property
    def total(self):
        return self.predictor + self.refiner + self.face

    @property
    def fps(self):
        return self.frames / max(self.total, 1e-9)


class HolisticPipeline:
    """Composes frozen stages for inference.

    Stages are (model/stage, TrainState-or-variables) pairs; the face stage
    is optional (its jaw/expression output splices over the body stages' —
    reference ai1.py:61-77).
    """

    def __init__(self, vq_model, vq_variables, predictor_stage: PredictorStage,
                 predictor_state, refiner_stage: RefinerStage, refiner_state,
                 face_model=None, face_state=None,
                 window: int = 180, overlap: int = 30, refine_window: int = 176):
        self.vq_model = vq_model
        self.vq_variables = vq_variables
        self.predictor_stage = predictor_stage
        self.predictor_state = predictor_state
        self.refiner_stage = refiner_stage
        self.refiner_state = refiner_state
        self.face_model = face_model
        self.face_state = face_state
        self.window = window
        self.overlap = overlap
        self.refine_window = refine_window
        self._predict = make_predictor_infer_fn(
            predictor_stage, vq_model, vq_variables)
        self._refine = make_refiner_infer_fn(refiner_stage)
        self.timers = PipelineTimers()

    # ------------------------------------------------------------------
    def _block(self, x):
        # value-fetch barrier: block_until_ready returns at enqueue on the
        # axon backend and would under-measure the stage timers
        from probtalk_tpu.utils.profiling import device_sync

        device_sync(x)
        return x

    def generate_window(self, key, aud_w, speaker, context=None,
                        context_mask=None):
        """One window: audio (B, W, Ca) [+ optional known context] ->
        (refined (B, W, C), prelim, codes)."""
        b, w, _ = aud_w.shape
        c = self.predictor_stage.mot_dim
        if context is None:
            context = jnp.zeros((b, w, c), aud_w.dtype)
            context_mask = jnp.zeros((b, w, 1), aud_w.dtype)
        t0 = time.perf_counter()
        prelim, codes = self._block(self._predict(
            self.predictor_state, key, context, context_mask, speaker, aud_w))
        t1 = time.perf_counter()
        refined = self._block(self._refine(
            self.refiner_state, prelim, aud_w, context_mask, speaker))
        # known context frames pass through unrefined
        refined = context * context_mask + refined * (1.0 - context_mask)
        t2 = time.perf_counter()
        self.timers.predictor += t1 - t0
        self.timers.refiner += t2 - t1
        self.timers.frames += b * w
        return refined, prelim, codes

    # ------------------------------------------------------------------
    def generate(self, key, aud_feat, speaker, B: int = 1,
                 gt_context=None, smooth_seams: bool = False) -> jnp.ndarray:
        """Full-length generation with sliding-window context feedback.

        aud_feat: (T, Ca) motion-fps audio features; returns (B, T, C)
        normalized fbhe motion. Schedule: first window `window` frames, then
        steps of `window - overlap` feeding the trailing `overlap` generated
        frames back as known context (test_holisticbody.py:240-261 uses
        overlap=30 via mask promotion; demo.py uses the same 180/30 grid).
        """
        t_total = aud_feat.shape[0]
        w, ov = self.window, self.overlap
        step = w - ov
        aud = jnp.asarray(aud_feat)[None].repeat(B, 0)
        c = self.predictor_stage.mot_dim

        if t_total <= w:
            aud_w = _pad_time(aud, w)
            out, _, _ = self.generate_window(key, aud_w, speaker)
            return out[:, :t_total]

        outputs = jnp.zeros((B, t_total, c), jnp.float32)
        pos = 0
        first = True
        seams = []
        while pos < t_total:
            key, k = jax.random.split(key)
            end = min(pos + w, t_total)
            aud_w = _pad_time(aud[:, pos:end], w)
            if first:
                ctx = None
                mask = None
            else:
                ctx = jnp.zeros((B, w, c), jnp.float32)
                ctx = ctx.at[:, :ov].set(outputs[:, pos: pos + ov])
                mask = jnp.zeros((B, w, 1), jnp.float32).at[:, :ov].set(1.0)
                seams.append(pos + ov)
            refined, _, _ = self.generate_window(k, aud_w, speaker, ctx, mask)
            outputs = outputs.at[:, pos:end].set(refined[:, : end - pos])
            pos += step
            first = False
        if smooth_seams and seams:
            # body+hand channels only (the reference smooths each_dim[0]
            # .. jaw+body+hand, refiner.py:557)
            jaw_d = body_parts.each_dim(True)[0]
            outputs = gaussian_smooth_around(outputs, seams, jaw_d,
                                             min(jaw_d + 270, c))
        return outputs


def continue_generation(pipe: "HolisticPipeline", key, prev_motion, aud_feat,
                        speaker, num_pre: int = 24):
    """Continue a previous generation: the trailing ``num_pre`` frames of
    ``prev_motion`` seed the next window as known context (the reference's
    ``continuity`` inference, predictor.py:328-396 with num_pre=24).

    prev_motion: (B, T_prev, C); aud_feat: (T_new, Ca) for the continuation.
    Returns (B, T_new, C) new frames (context excluded).
    """
    b = prev_motion.shape[0]
    t_new = aud_feat.shape[0]
    w = pipe.window
    c = prev_motion.shape[-1]
    aud = jnp.asarray(aud_feat)[None].repeat(b, 0)

    outputs = []
    ctx_frames = prev_motion[:, -num_pre:]
    pos = 0
    while pos < t_new:
        key, k = jax.random.split(key)
        take = min(w - num_pre, t_new - pos)
        aud_w = _pad_time(
            jnp.concatenate(
                [jnp.zeros((b, num_pre, aud.shape[-1]), aud.dtype),
                 aud[:, pos: pos + take]], axis=1),
            w)
        ctx = jnp.zeros((b, w, c), jnp.float32).at[:, :num_pre].set(ctx_frames)
        mask = jnp.zeros((b, w, 1), jnp.float32).at[:, :num_pre].set(1.0)
        refined, _, _ = pipe.generate_window(k, aud_w, speaker, ctx, mask)
        new = refined[:, num_pre: num_pre + take]
        outputs.append(new)
        ctx_frames = jnp.concatenate([ctx_frames, new], axis=1)[:, -num_pre:]
        pos += take
    return jnp.concatenate(outputs, axis=1)


def gaussian_smooth_around(x, time_points, ch_start: int, ch_end: int,
                           window_size: int = 5, sigma: float = 2.0,
                           halfwidth: int = 10):
    """Gaussian-smooth channels [ch_start:ch_end) of (B, T, C) motion in a
    ±halfwidth region around each given time point — the reference's
    window-seam smoother (``refiner.py:635``
    ``gaussian_smoothing_around_timepoint``; disabled by default there and
    here, kept for parity). jit-friendly: full-sequence depthwise conv +
    a static seam-region blend mask."""
    x = jnp.asarray(x)
    t = x.shape[1]
    k = jnp.arange(window_size) - window_size // 2
    kernel = jnp.exp(-0.5 * (k / sigma) ** 2)
    kernel = kernel / kernel.sum()

    seg = x[..., ch_start:ch_end]
    pad = window_size // 2
    padded = jnp.pad(seg, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    # depthwise smoothing along time
    sm = sum(kernel[i] * padded[:, i: i + t] for i in range(window_size))

    region = jnp.zeros((t,), bool)
    for tp in time_points:
        lo, hi = max(tp - halfwidth, 0), min(tp + halfwidth, t)
        region = region.at[lo:hi].set(True)
    blended = jnp.where(region[None, :, None], sm, seg)
    return jnp.concatenate(
        [x[..., :ch_start], blended, x[..., ch_end:]], axis=-1)


def _pad_time(x, t_out: int):
    t = x.shape[1]
    if t == t_out:
        return x
    if t > t_out:
        return x[:, :t_out]
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, t_out - t)
    return jnp.pad(x, pad, mode="edge")


def splice_face(body_out, face_out, convert_to_6d: bool = True):
    """Overwrite jaw + expression channels of the body pipeline's fbhe
    output with the face generator's (reference ai1.py:61-77)."""
    jaw_d = body_parts.each_dim(convert_to_6d)[0]
    exp_d = body_parts.each_dim(convert_to_6d)[3]
    return jnp.concatenate(
        [face_out[..., :jaw_d], body_out[..., jaw_d:-exp_d],
         face_out[..., jaw_d:]],
        axis=-1,
    )
