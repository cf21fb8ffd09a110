"""Converted-reference-checkpoint end-to-end proof (VERDICT r3 item 6).

No pretrained probtalk/TalkSHOW release is obtainable in this env, so the
proof is synthesized exactly as prescribed: take the parity campaign's
TRAINED torch checkpoints — VQ 1500 steps (``nets/inpainting/vq_teacher``)
plus predictor/refiner 600 steps (``nets/inpainting/{predictor,refiner}``,
the reference's own wrappers run by scripts/parity_full_campaign.py) —
convert them through ``convert/torch_checkpoint`` into probtalk_tpu
stages, and generate the 8 demo clips through the compiled streaming
path. The output lands as experiments/parity_full/gen_jax_convtorch_s0.npz
so ``parity_full_campaign.py score`` ranks it in PARITY_FGD.json right
next to the torch wrappers' OWN generations from the SAME weights
(reference harness: scripts/test_holisticbody.py:372): matching FGD there
proves converter + inference path on trained weights, and isolates any
residual jax-vs-torch gap to *training* dynamics.

Runs on CPU by default (the TPU is owned by the round's evidence queue;
this is a correctness proof, not a perf claim — gen_seconds is recorded
honestly and marked cpu in the arm name... the name stays convtorch, the
seconds column speaks for itself).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

if not os.environ.get("CONVERTED_E2E_TPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")   # leave the TPU to the queue

_spec = importlib.util.spec_from_file_location(
    "parity_full_campaign",
    os.path.join(REPO, "scripts", "parity_full_campaign.py"))
pfc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pfc)


def state_of(variables) -> types.SimpleNamespace:
    """Converted {'params','batch_stats'} -> the .params/.mutables duck
    type the streaming factory reads (train/state.TrainState surface)."""
    mut = {}
    if variables.get("batch_stats"):
        mut["batch_stats"] = variables["batch_stats"]
    return types.SimpleNamespace(params=variables["params"], mutables=mut)


def main():
    import jax
    import jax.numpy as jnp
    import torch

    from probtalk_tpu.convert.torch_checkpoint import (
        convert_predictor_stage, convert_refiner_stage, convert_vqvae,
    )
    from probtalk_tpu.eval.harness import device_sync
    from probtalk_tpu.models.vqvae import VQVAE
    from probtalk_tpu.streaming import make_streaming_generate
    from probtalk_tpu.train.stages import PredictorStage, RefinerStage

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    out_npz = os.path.join(pfc.DIR, "gen_jax_convtorch_s0.npz")
    if os.path.exists(out_npz):
        pfc.log("convtorch arm: gen npz exists, skipping")
        return

    def load_wrapper_ckpt(kind):
        # prefer the small durable *_final.pth (state-only, harvested into
        # git so this proof is reproducible after the experiments/ wipe);
        # fall back to the in-place resume checkpoint if it is complete
        for name in (f"torch_{kind}_{pfc.STEPS}_final.pth",
                     f"torch_{kind}_{pfc.STEPS}.pth"):
            path = os.path.join(pfc.DIR, name)
            if os.path.exists(path):
                ck = torch.load(path, map_location="cpu", weights_only=False)
                assert ck["step"] >= pfc.STEPS, (name, ck["step"])
                return ck
        raise FileNotFoundError(
            f"no complete torch_{kind} checkpoint in {pfc.DIR}")

    saved_vq = pfc.load_torch_vq()
    pred_ck = load_wrapper_ckpt("pred")
    ref_ck = load_wrapper_ckpt("ref")

    vq = VQVAE(in_dim=376, embedding_dim=512, num_codes=128, groups=4,
               hiddens=1024, res_layers=2)
    vq_vars = jax.tree.map(jnp.asarray, convert_vqvae(saved_vq["state"]["VQ"]))
    # the campaign's torch wrappers run config/transformer.json: p_text null
    # => no TextEnc; audio on; 4 speakers; MaskGit decoder
    pred = PredictorStage(mot_dim=376, num_code=128, groups=4, aud_dim=768)
    ref = RefinerStage(in_dim=376, aud_dim=768)
    pstate = state_of(jax.tree.map(jnp.asarray,
                                   convert_predictor_stage(pred_ck["state"])))
    rstate = state_of(jax.tree.map(jnp.asarray,
                                   convert_refiner_stage(ref_ck["state"])))
    pfc.log("torch pred/ref/vq converted -> jax stages")

    gen = make_streaming_generate(vq, vq_vars, pred, pstate, ref, rstate,
                                  window=180, overlap=30)
    clips, mean, std, _ = pfc.load_data()
    outs, gen_seconds = {}, 0.0
    key = jax.random.key(7)
    for clip in clips:
        key, k = jax.random.split(key)
        aud = jnp.asarray(clip.aud_feat)[None].repeat(pfc.B_GEN, 0)
        spk = jnp.full((pfc.B_GEN,), int(clip.speaker), jnp.int32)
        t0 = time.perf_counter()
        out = gen(k, aud, spk)
        device_sync(out)
        gen_seconds += time.perf_counter() - t0
        outs[clip.name] = np.asarray(out)
        pfc.log(f"convtorch gen {clip.name}: {outs[clip.name].shape}")
    pfc.atomic_savez(out_npz, gen_seconds=gen_seconds, **outs)
    pfc.log(f"convtorch generation total {gen_seconds:.1f}s "
            f"({jax.devices()[0].platform})")


if __name__ == "__main__":
    main()
