"""Whole-clip generation compiled as ONE XLA program.

``HolisticPipeline.generate`` replays one compiled executable per window
from a python loop (already fast). This module goes further — SURVEY's
hard-part #5 ("windowed streaming inference with context feedback expressed
as a scan with static window shapes"): the first window plus a
``lax.scan`` over the remaining windows, with the trailing-overlap context
carried functionally. One compile per (batch, n_windows) bucket; zero
host round-trips inside a clip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def make_streaming_generate(vq_model, vq_variables, pred_stage, pred_state,
                            ref_stage, ref_state, window: int = 180,
                            overlap: int = 30):
    """-> generate(key, aud (B, T, Ca), speaker) compiled end-to-end.

    T must satisfy T = window + k*(window-overlap) for some k >= 0; use
    ``pad_to_windows`` to bucket arbitrary lengths.
    """
    step = window - overlap
    pred_vars_v = {"params": pred_state.params, **pred_state.mutables}
    ref_vars_v = {"params": ref_state.params, **ref_state.mutables}
    vq_vars_v = vq_variables

    def one_window(variables, key, aud_w, ctx, mask, speaker):
        pred_vars, ref_vars, vq_vars = variables
        masked = ctx * mask
        codes = pred_stage.apply(pred_vars, key, masked, mask, speaker, aud_w,
                                 method=pred_stage.sample)
        prelim = vq_model.apply(vq_vars, codes, train=False,
                                method=vq_model.decode_codes)
        b = aud_w.shape[0]
        prelim = jax.image.resize(prelim, (b, window, prelim.shape[-1]),
                                  method="linear")
        blended = masked * mask + prelim * (1.0 - mask)
        refined = ref_stage.apply(ref_vars, blended, aud_w, mask, speaker,
                                  train=False)
        return ctx * mask + refined * (1.0 - mask)

    # NOTE: model variables are jit ARGUMENTS, not closure captures —
    # closed-over arrays are serialized into the HLO as literal constants,
    # which blows past remote-compile request limits at real model sizes.
    @functools.partial(jax.jit, static_argnames=("n_extra",))
    def generate(variables, key, aud, speaker, n_extra: int):
        b, t, ca = aud.shape
        c = pred_stage.mot_dim
        key, k0 = jax.random.split(key)
        zero_ctx = jnp.zeros((b, window, c), jnp.float32)
        zero_mask = jnp.zeros((b, window, 1), jnp.float32)
        first = one_window(variables, k0, aud[:, :window], zero_ctx,
                           zero_mask, speaker)
        if n_extra == 0:
            return first

        ctx_mask = jnp.zeros((b, window, 1), jnp.float32).at[:, :overlap].set(1.0)
        starts = window - overlap + step * jnp.arange(n_extra)

        def body(carry, inp):
            tail, key = carry                      # (B, overlap, C)
            start = inp
            key, k = jax.random.split(key)
            aud_w = jax.lax.dynamic_slice_in_dim(aud, start, window, axis=1)
            ctx = jnp.zeros((b, window, c), jnp.float32).at[:, :overlap].set(tail)
            out = one_window(variables, k, aud_w, ctx, ctx_mask, speaker)
            new = out[:, overlap:]                 # (B, step, C)
            return (out[:, -overlap:], key), new

        (_, _), news = jax.lax.scan(body, (first[:, -overlap:], key), starts)
        # news: (n_extra, B, step, C) -> (B, n_extra*step, C)
        news = jnp.moveaxis(news, 0, 1).reshape(b, n_extra * step, c)
        return jnp.concatenate([first, news], axis=1)

    def run(key, aud, speaker):
        t = aud.shape[1]
        aud_p, n_extra = pad_to_windows(aud, window, step)
        out = generate((pred_vars_v, ref_vars_v, vq_vars_v), key, aud_p,
                       speaker, n_extra)
        return out[:, :t]

    return run


def pad_to_windows(aud, window: int, step: int):
    """Edge-pad (B, T, Ca) so T = window + k*step; returns (padded, k)."""
    t = aud.shape[1]
    if t <= window:
        k = 0
        t_pad = window
    else:
        k = -(-(t - window) // step)
        t_pad = window + k * step
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0)]
        aud = jnp.pad(aud, pad, mode="edge")
    return aud, k
