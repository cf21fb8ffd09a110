"""All-in-one model facade: the reference's ``nets/ai1.py`` API surface.

``All_In_One_Model`` composes an optional face model with the body
predictor+refiner chain, dispatches by ``forward_type`` method name, and
splices the face output's jaw/expression over the body output
(``nets/ai1.py:19-89``). This facade wraps the functional stages so
reference users keep a familiar entry point; new code should use
``probtalk_tpu.pipeline.HolisticPipeline`` directly.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from probtalk_tpu.pipeline import HolisticPipeline, splice_face


class AllInOneModel:
    """forward_type dispatch over the composed stages.

    Supported forward types (reference ai1.py:44-89):
      'infer_on_audio' — audio features -> motion (B samples)
      'infer_on_batch' — window with known context -> motion
    """

    def __init__(self, pipeline: HolisticPipeline, face_model=None,
                 face_variables=None, num_classes: int = 4):
        self.pipeline = pipeline
        self.face_model = face_model
        self.face_variables = face_variables
        self.num_classes = num_classes
        self.timers = pipeline.timers

    # ------------------------------------------------------------------
    def _face(self, aud_feat, speaker):
        if self.face_model is None:
            return None
        from probtalk_tpu.utils.profiling import device_sync

        t0 = time.perf_counter()
        out = self.face_model.apply(self.face_variables, aud_feat, speaker,
                                    train=False)
        device_sync(out)
        self.timers.face += time.perf_counter() - t0
        return out

    def __call__(self, forward_type: str = "infer_on_audio", **kw):
        if forward_type == "infer_on_audio":
            return self.infer_on_audio(**kw)
        if forward_type == "infer_on_batch":
            return self.infer_on_batch(**kw)
        raise ValueError(f"unknown forward_type {forward_type!r}")

    def infer_on_audio(self, aud_feat, speaker, B: int = 1, key=None,
                       face_aud_feat=None, **kw):
        """(T, Ca) features -> (B, T, C) fbhe motion (+face splice)."""
        key = key if key is not None else jax.random.key(0)
        spk = jnp.full((B,), int(speaker), jnp.int32) \
            if np.ndim(speaker) == 0 else jnp.asarray(speaker)
        body = self.pipeline.generate(key, jnp.asarray(aud_feat), spk, B=B)
        if self.face_model is not None and face_aud_feat is not None:
            face = self._face(jnp.asarray(face_aud_feat)[None].repeat(B, 0), spk)
            body = splice_face(body, face)
        return body

    def infer_on_batch(self, aud_feat, gt_poses, mask, speaker, key=None, **kw):
        """One window with known context (B, W, *) -> refined motion."""
        key = key if key is not None else jax.random.key(0)
        refined, prelim, codes = self.pipeline.generate_window(
            key, jnp.asarray(aud_feat), jnp.asarray(speaker),
            jnp.asarray(gt_poses), jnp.asarray(mask))
        return refined
