"""Stage pipelines: predictor and refiner training around a frozen PQ-VAE.

Capabilities of the reference train wrappers
(``nets/inpainting/predictor.py:168-280``, ``refiner.py:183-311``) as pure
jitted steps. The frozen VQ's variables are closed over as constants
(stop-gradient); the reference's ``with torch.no_grad(): VQ.encode(...)``
becomes an eval-mode apply.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from probtalk_tpu.models.conv import ConditionEncoder
from probtalk_tpu.models.predictor import PredictorNet
from probtalk_tpu.models.rtransformer import RTransformer
from probtalk_tpu.train import losses
from probtalk_tpu.train.state import TrainState
from probtalk_tpu.train.steps import optax_global_norm
from probtalk_tpu.utils.interp import resize_time


# ---------------------------------------------------------------------------
# context masks
# ---------------------------------------------------------------------------

def sample_context_mask(key, bs: int, t: int, context_len: int = 30,
                        context_prob: float = 0.5, mode: str = "bank",
                        zero_rows: Optional[int] = None):
    """(bs, t, 1) masks: a random contiguous ``context_len`` window of known
    motion per sample.

    mode='bank' (default): every row draws a window from the precomputed
    onset-shifted bank, then the first ``zero_rows`` batch rows are zeroed
    (predictor.py:94-96, 213-227; refiner.py:104-109, 236-240 — the
    reference literally does ``mask[:64] = 0`` on batch rows). At the
    reference's bs=128 that unconditions exactly half the batch.

    ``zero_rows=None`` (default) scales that intent to any batch:
    ``bs // 2`` rows are zeroed — identical to the reference at bs=128,
    and still half-unconditioned at small batches. Pass ``zero_rows=64``
    for the literal reference constant (which unconditions ALL rows when
    bs<=64 — the parity ablation pins this to stay bit-faithful to the
    running torch wrappers at the campaign's bs=8).

    mode='bernoulli' (round-2 behavior): each row's window is active with
    probability ``context_prob`` — batch-order independent, same expected
    context fraction as the scaled bank but i.i.d. per row.
    """
    k1, k2 = jax.random.split(key)
    start = jax.random.randint(k1, (bs, 1), 0, max(t - context_len + 1, 1))
    pos = jnp.arange(t)[None, :]
    win = (pos >= start) & (pos < start + context_len)
    if mode == "bank":
        if zero_rows is None:
            zero_rows = bs // 2
        active = (jnp.arange(bs) >= zero_rows)[:, None]
    elif mode == "bernoulli":
        active = jax.random.bernoulli(k2, context_prob, (bs, 1))
    else:
        raise ValueError(mode)
    return (win & active).astype(jnp.float32)[..., None]


# ---------------------------------------------------------------------------
# predictor stage
# ---------------------------------------------------------------------------

class PredictorStage(nn.Module):
    """Trainable bundle: AudEnc + TextEnc + PredictorNet
    (the reference wrapper's trainable members, predictor.py:67-76)."""

    mot_dim: int = 376
    num_code: int = 128
    groups: int = 4
    n_classes: int = 4
    dec_layers: int = 6
    use_audio: bool = True
    use_text: bool = False
    maskgit: bool = True
    maskgit_T: int = 8
    motion_context: bool = True
    identity: bool = True
    aud_dim: int = 768
    text_dim: int = 768
    decoder_type: str = "transformer"   # 'transformer' | 'pixel'
    # (the reference's config.Model.transformer flag, predictornet.py:56-58)
    dtype: object = None   # bf16 compute option
    train_mask_mode: str = "topk"       # see PTransformer.train_mask_mode

    def setup(self):
        if self.use_audio:
            self.aud_enc = ConditionEncoder(256)
        if self.use_text:
            self.text_enc = ConditionEncoder(256)
        self.net = PredictorNet(
            mot_dim=self.mot_dim, num_code=self.num_code, groups=self.groups,
            n_classes=self.n_classes, dec_layers=self.dec_layers,
            identity=self.identity, maskgit=self.maskgit,
            maskgit_T=self.maskgit_T, motion_context=self.motion_context,
            use_audio=self.use_audio, use_text=self.use_text,
            decoder_type=self.decoder_type, dtype=self.dtype,
            train_mask_mode=self.train_mask_mode,
        )

    def _encode_conditions(self, aud, text, train):
        audio = self.aud_enc(aud, train) if self.use_audio else None
        txt = self.text_enc(text, train) if self.use_text else None
        return audio, txt

    def __call__(self, masked_motion, codes, mask, label, aud, text=None,
                 epoch_ratio=1.0, train: bool = False):
        """-> logits (B, T/8, G, K)."""
        audio, txt = self._encode_conditions(aud, text, train)
        return self.net(masked_motion, codes, mask, label, audio, txt,
                        epoch_ratio, train=train)

    def sample(self, key, masked_motion, mask, label, aud, text=None):
        """-> code indices (B, T/8, G)."""
        audio, txt = self._encode_conditions(aud, text, False)
        return self.net.sample(key, masked_motion, mask, label, audio, txt)

    def sample_max(self, masked_motion, mask, label, aud, text=None):
        """Deterministic greedy decode -> codes (B, T/8, G)
        (reference sample_max, PTransformer.py:644-655)."""
        audio, txt = self._encode_conditions(aud, text, False)
        return self.net.sample_max(masked_motion, mask, label, audio, txt)


def make_predictor_train_step(stage: PredictorStage, vq_model, vq_variables,
                              donate: bool = True,
                              context_mask_mode: str = "bank",
                              context_zero_rows: Optional[int] = None):
    """Jitted predictor train step.

    batch: {'poses_fbhe': (B,T,C), 'aud_feat': (B,T,Ca), 'speaker': (B,),
            'epoch_ratio': scalar, optionally 'text_feat'}
    """
    def loss_fn(params, mutables, vq_vars, batch, rng):
        gt = batch["poses_fbhe"]
        bs, t, _ = gt.shape
        k_mask, k_net, k_drop = jax.random.split(rng, 3)

        if stage.motion_context:
            mask = sample_context_mask(k_mask, bs, t, mode=context_mask_mode,
                                       zero_rows=context_zero_rows)
        else:
            mask = jnp.zeros((bs, t, 1), gt.dtype)
        masked_motion = gt * mask

        # frozen VQ: GT codes as prediction targets (predictor.py:232-240)
        _, _, codes = vq_model.apply(vq_vars, gt, train=False,
                                     method=vq_model.encode)
        codes = jax.lax.stop_gradient(codes)

        variables = {"params": params, **mutables}
        logits, new_mut = stage.apply(
            variables, masked_motion, codes, mask, batch["speaker"],
            batch["aud_feat"], batch.get("text_feat"),
            batch.get("epoch_ratio", 1.0), train=True,
            mutable=["batch_stats"],
            rngs={"mask": k_net, "dropout": k_drop},
        )
        ce = losses.cross_entropy(logits.reshape(-1, logits.shape[-1]),
                                  codes.reshape(-1))
        acc = jnp.mean(jnp.argmax(logits, -1) == codes)
        return ce, (new_mut, {"loss": ce, "code_acc": acc})

    # frozen VQ enters the jit as an argument, not a closure constant
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def _step(state: TrainState, vq_vars, batch, rng):
        (_, (new_mut, ld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.mutables, vq_vars, batch, rng
        )
        new_state = state.apply_gradients(grads, new_mutables=new_mut)
        ld["grad_norm"] = optax_global_norm(grads)
        return new_state, ld

    def step(state, batch, rng):
        return _step(state, vq_variables, batch, rng)

    return step


def make_predictor_infer_fn(stage: PredictorStage, vq_model, vq_variables):
    """Jitted inference: audio (+context) -> codes -> decoded preliminary
    motion, interpolated to T and blended with known context
    (reference infer_on_batch, predictor.py:398-448).

    vq_variables enter the jit as an ARGUMENT: a closure capture would
    serialize the ~30M-param VQ into the HLO as literal constants (slow
    executables + oversized remote-compile requests)."""

    @jax.jit
    def infer(state: TrainState, vq_vars, key, gt_poses, mask, speaker, aud,
              text=None):
        variables = {"params": state.params, **state.mutables}
        masked_motion = gt_poses * mask
        codes = stage.apply(variables, key, masked_motion, mask, speaker, aud,
                            text, method=stage.sample)
        prelim = vq_model.apply(vq_vars, codes, train=False,
                                method=vq_model.decode_codes)
        prelim = resize_time(prelim, gt_poses.shape[1])
        blended = masked_motion * mask + prelim * (1.0 - mask)
        return blended, codes

    def run(state, key, gt_poses, mask, speaker, aud, text=None):
        return infer(state, vq_variables, key, gt_poses, mask, speaker, aud,
                     text)

    return run


def make_predictor_code_eval_fn(stage: PredictorStage, vq_model, vq_variables,
                                mask_ratio: float = 0.85):
    """Masked-code CE evaluation: mask ~85% of GT codes, measure the
    predictor's CE on the masked positions (reference infer_on_vq,
    predictor.py:450-536 final variant)."""

    @jax.jit
    def _evaluate(state: TrainState, vq_vars, key, gt_poses, speaker, aud,
                  text=None):
        variables = {"params": state.params, **state.mutables}
        _, _, codes = vq_model.apply(vq_vars, gt_poses, train=False,
                                     method=vq_model.encode)
        k1, _ = jax.random.split(key)
        code_mask = jax.random.uniform(k1, codes.shape) < mask_ratio
        masked = jnp.where(code_mask, stage.num_code, codes)
        mask = jnp.zeros_like(gt_poses[..., :1])
        logits = stage.apply(variables, gt_poses * mask, masked, mask, speaker,
                             aud, text, 1.0, train=False)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, codes[..., None], axis=-1)[..., 0]
        ce = jnp.sum(nll * code_mask) / jnp.clip(jnp.sum(code_mask), 1)
        return ce

    def evaluate(state, key, gt_poses, speaker, aud, text=None):
        return _evaluate(state, vq_variables, key, gt_poses, speaker, aud,
                         text)

    return evaluate


# ---------------------------------------------------------------------------
# refiner stage
# ---------------------------------------------------------------------------

class RefinerStage(nn.Module):
    """Trainable bundle: RTransformer (audio enc is identity for wav2vec
    features — reference refiner AudEnc, refiner.py:66-79)."""

    in_dim: int = 376
    aud_dim: int = 768
    n_classes: int = 4
    layers: int = 6
    motion_context: bool = True
    dtype: object = None   # bf16 compute option
    flash: bool = False    # Pallas blockwise attention (long-clip eval)

    def setup(self):
        self.net = RTransformer(
            in_dim=self.in_dim, condi_dim=self.aud_dim, layers=self.layers,
            n_classes=self.n_classes, motion_context=self.motion_context,
            dtype=self.dtype, flash=self.flash,
        )

    def __call__(self, x, aud, mask, label, train: bool = False):
        return self.net(x, aud, mask, label, train=train)


def make_refiner_train_step(stage: RefinerStage, vq_model, vq_variables,
                            noise_std: float = 0.05, donate: bool = True,
                            each_dim=None, context_mask_mode: str = "bank",
                            context_zero_rows: Optional[int] = None):
    """Jitted refiner train step (reference refiner.py:183-311):
    VQ-reconstruct GT, add gaussian noise, blend with GT context, regress."""
    def loss_fn(params, mutables, vq_vars, batch, rng):
        gt = batch["poses_fbhe"]
        bs, t, _ = gt.shape
        k_mask, k_noise, k_drop = jax.random.split(rng, 3)

        mask = sample_context_mask(k_mask, bs, t, mode=context_mask_mode,
                                   zero_rows=context_zero_rows)

        vq_poses, _, _ = vq_model.apply(vq_vars, gt, train=False)
        vq_poses = resize_time(vq_poses, t)
        vq_poses = jax.lax.stop_gradient(vq_poses)
        vq_poses = vq_poses + noise_std * jax.random.normal(k_noise, vq_poses.shape)

        inp = gt * mask + vq_poses * (1.0 - mask)

        variables = {"params": params, **mutables}
        pred, new_mut = stage.apply(
            variables, inp, batch["aud_feat"], mask, batch["speaker"],
            train=True, mutable=["batch_stats"], rngs={"dropout": k_drop},
        )
        total, ld = losses.refiner_loss(pred, gt, mask, each_dim=each_dim)
        ld["loss"] = total
        return total, (new_mut, ld)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def _step(state: TrainState, vq_vars, batch, rng):
        (_, (new_mut, ld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.mutables, vq_vars, batch, rng
        )
        new_state = state.apply_gradients(grads, new_mutables=new_mut)
        ld["grad_norm"] = optax_global_norm(grads)
        return new_state, ld

    def step(state, batch, rng):
        return _step(state, vq_variables, batch, rng)

    return step


def make_refiner_infer_fn(stage: RefinerStage):
    """Jitted refinement of a preliminary motion
    (reference infer_on_batch, refiner.py:512-558)."""

    @jax.jit
    def infer(state: TrainState, prelim, aud, mask, speaker):
        variables = {"params": state.params, **state.mutables}
        return stage.apply(variables, prelim, aud, mask, speaker, train=False)

    return infer
