"""Train steps for the auxiliary and legacy stages.

Covers the remaining TrainWrapper capabilities of the reference:
  * s2g_face        (``nets/smplx_face.py:25-193``)
  * emb_net         (``nets/embedding_net.py:159-339`` — the FGD embedders)
  * s2g_body_vq     (``nets/smplx_body_vq.py:23-307`` — body/hand VQVAEs)
  * s2g_body_pixel  (``nets/smplx_body_pixel.py:28-279`` — AR prior)
  * speech2gesture  (``nets/speech2gesture.py:225-606`` — GAN baseline)

All as pure jitted (state, batch, rng) -> (state, metrics) functions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from probtalk_tpu.models.face import face_loss
from probtalk_tpu.train import losses
from probtalk_tpu.train.state import TrainState
from probtalk_tpu.train.steps import optax_global_norm


def make_face_train_step(model, donate: bool = True):
    """batch: {'aud_feat' (B,T,768), 'face_gt' (B,T,106), 'speaker' (B,)}."""

    def loss_fn(params, mutables, batch, rng):
        variables = {"params": params, **mutables}
        pred = model.apply(variables, batch["aud_feat"], batch["speaker"],
                           train=True, rngs={"dropout": rng})
        total, ld = face_loss(pred, batch["face_gt"])
        ld["loss"] = total
        return total, (mutables, ld)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, batch, rng):
        (_, (new_mut, ld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.mutables, batch, rng)
        new_state = state.apply_gradients(grads, new_mutables=new_mut)
        ld["grad_norm"] = optax_global_norm(grads)
        return new_state, ld

    return step


def make_embedder_train_step(model, variational: bool = False,
                             donate: bool = True):
    """FGD embedder AE training: L1 recon + velocity (+ KL if variational)
    (reference embedding_net TrainWrapper losses).
    batch: {'windows' (B, 90, C)}."""

    def loss_fn(params, mutables, batch, rng):
        variables = {"params": params, **mutables}
        (z, recon, mu, logvar), new_mut = model.apply(
            variables, batch["windows"], train=True, rng=rng,
            mutable=["batch_stats"])
        rec = jnp.mean(jnp.abs(recon - batch["windows"]))
        vel = jnp.mean(jnp.abs(jnp.diff(recon, axis=1) -
                               jnp.diff(batch["windows"], axis=1)))
        total = rec + vel
        ld = {"rec_loss": rec, "velocity_loss": vel}
        if variational:
            kl = losses.kl_normal(mu, logvar)
            total = total + 0.01 * kl
            ld["kl_loss"] = kl
        ld["loss"] = total
        return total, (new_mut, ld)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, batch, rng):
        (_, (new_mut, ld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.mutables, batch, rng)
        new_state = state.apply_gradients(grads, new_mutables=new_mut)
        ld["grad_norm"] = optax_global_norm(grads)
        return new_state, ld

    return step


def make_legacy_vq_train_step(model, donate: bool = True):
    """TalkSHOW stage-1 VQ training on one body part
    (reference smplx_body_vq: smooth-L1 recon + commitment).
    batch: {'motion' (B, T, C)}."""

    def loss_fn(params, mutables, batch, rng):
        variables = {"params": params, **mutables}
        (pred, commit, _idx), new_mut = model.apply(
            variables, batch["motion"], train=True,
            mutable=["quant", "batch_stats"], rngs={"quant": rng})
        rec = losses.smooth_l1(pred, batch["motion"])
        vel = jnp.mean(jnp.abs(jnp.diff(pred, axis=1) -
                               jnp.diff(batch["motion"], axis=1)))
        total = rec + vel + commit
        return total, (new_mut, {"loss": total, "rec_loss": rec,
                                 "commit_loss": commit, "velocity_loss": vel})

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, batch, rng):
        (_, (new_mut, ld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.mutables, batch, rng)
        new_state = state.apply_gradients(grads, new_mutables=new_mut)
        ld["grad_norm"] = optax_global_norm(grads)
        return new_state, ld

    return step


def make_pixelcnn_train_step(prior, vq_model, vq_variables, donate: bool = True):
    """s2g_body_pixel: CE of the AR prior on frozen legacy-VQ code grids
    (reference smplx_body_pixel.py:28-279). The (body, hand) code pair forms
    the W=2 grid axis. batch: {'body' (B,T,C_b), 'hand' (B,T,C_h),
    'aud_code_rate' (B,T/4,Ca), 'speaker' (B,)}."""
    body_vq, hand_vq = vq_model if isinstance(vq_model, tuple) else (vq_model, vq_model)
    body_vars, hand_vars = (vq_variables if isinstance(vq_variables, tuple)
                            else (vq_variables, vq_variables))

    def loss_fn(params, mutables, bvars, hvars, batch, rng):
        _, body_codes = body_vq.apply(bvars, batch["body"], train=False,
                                      method=body_vq.encode)
        _, hand_codes = hand_vq.apply(hvars, batch["hand"], train=False,
                                      method=hand_vq.encode)
        codes = jnp.stack([body_codes, hand_codes], axis=-1)  # (B, T/4, 2)
        codes = jax.lax.stop_gradient(codes)
        variables = {"params": params, **mutables}
        logits = prior.apply(variables, codes, batch["speaker"],
                             batch.get("aud_code_rate"))
        ce = losses.cross_entropy(logits.reshape(-1, logits.shape[-1]),
                                  codes.reshape(-1))
        acc = jnp.mean(jnp.argmax(logits, -1) == codes)
        return ce, (mutables, {"loss": ce, "code_acc": acc})

    # frozen VQ pair enters the jit as ARGUMENTS, not closure constants
    # (closure captures serialize into the HLO as literals — CLAUDE.md)
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def _step(state: TrainState, bvars, hvars, batch, rng):
        (_, (new_mut, ld)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.mutables,
                                   bvars, hvars, batch, rng)
        new_state = state.apply_gradients(grads, new_mutables=new_mut)
        ld["grad_norm"] = optax_global_norm(grads)
        return new_state, ld

    def step(state: TrainState, batch, rng):
        return _step(state, body_vars, hand_vars, batch, rng)

    return step


def make_body_ae_train_step(model, donate: bool = True):
    """s2g_body_ae: plain AE reconstruction (reference nets/body_ae.py
    losses: L1 + velocity). batch: {'motion' (B,T,C)}."""

    def loss_fn(params, mutables, batch, rng):
        variables = {"params": params, **mutables}
        (recon, _z), new_mut = model.apply(variables, batch["motion"],
                                           train=True,
                                           mutable=["batch_stats"])
        rec = jnp.mean(jnp.abs(recon - batch["motion"]))
        vel = jnp.mean(jnp.abs(jnp.diff(recon, axis=1) -
                               jnp.diff(batch["motion"], axis=1)))
        total = rec + vel
        return total, (new_mut, {"loss": total, "rec_loss": rec,
                                 "velocity_loss": vel})

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, batch, rng):
        (_, (new_mut, ld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.mutables, batch, rng)
        new_state = state.apply_gradients(grads, new_mutables=new_mut)
        ld["grad_norm"] = optax_global_norm(grads)
        return new_state, ld

    return step


def make_gan_train_steps(gen, disc, recon_weight: float = 1.0,
                         gan_weight: float = 1.0):
    """Speech2Gesture GAN: alternating G/D steps (reference
    speech2gesture.py TrainWrapper; LSGAN-style objectives).
    batch: {'aud_feat', 'motion'}."""

    def g_loss_fn(g_params, g_mut, d_params, d_mut, batch, rng):
        gv = {"params": g_params, **g_mut}
        fake, new_gmut = gen.apply(gv, batch["aud_feat"], train=True,
                                   mutable=["batch_stats"],
                                   rngs={"dropout": rng})
        rec = jnp.mean(jnp.abs(fake - batch["motion"]))
        total = recon_weight * rec
        ld = {"rec_loss": rec}
        if gan_weight:      # skip the D forward entirely for pure-recon
            dv = {"params": d_params, **d_mut}
            score = disc.apply(dv, fake, train=False)
            adv = jnp.mean((score - 1.0) ** 2)
            total = total + gan_weight * adv
            ld["adv_loss"] = adv
        ld["g_loss"] = total
        return total, (new_gmut, ld)

    def d_loss_fn(d_params, d_mut, g_params, g_mut, batch, rng):
        gv = {"params": g_params, **g_mut}
        fake = gen.apply(gv, batch["aud_feat"], train=False)
        dv = {"params": d_params, **d_mut}
        s_fake, new_dmut = disc.apply(dv, jax.lax.stop_gradient(fake),
                                      train=True, mutable=["batch_stats"])
        s_real, new_dmut = disc.apply({"params": d_params, **new_dmut},
                                      batch["motion"], train=True,
                                      mutable=["batch_stats"])
        total = jnp.mean(s_fake ** 2) + jnp.mean((s_real - 1.0) ** 2)
        return total, (new_dmut, {"d_loss": total})

    @jax.jit
    def g_step(g_state: TrainState, d_state: TrainState, batch, rng):
        (_, (new_mut, ld)), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_state.params, g_state.mutables, d_state.params, d_state.mutables,
            batch, rng)
        return g_state.apply_gradients(grads, new_mutables=new_mut), ld

    @jax.jit
    def d_step(d_state: TrainState, g_state: TrainState, batch, rng):
        (_, (new_mut, ld)), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_state.params, d_state.mutables, g_state.params, g_state.mutables,
            batch, rng)
        return d_state.apply_gradients(grads, new_mutables=new_mut), ld

    return g_step, d_step
