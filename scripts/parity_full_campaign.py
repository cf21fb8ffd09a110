"""FULL-SYSTEM quality parity: torch reference vs probtalk_tpu at FGD level.

Beyond the VQ-stage parity (parity_campaign.py): trains the reference's
predictor + refiner wrappers (their own losses/optimizers/curricula,
``nets/inpainting/{predictor,refiner}.py``) AND fresh probtalk_tpu stages
for the SAME steps on the SAME batches (identical 768-d audio features:
MFCC tiled 12x so both sides' wav2vec-dim encoders see identical input),
on top of the SAME 1500-step torch-vs-jax VQ pair. Both systems then
generate the 8 demo clips with the reference's sliding-window schedule and
are scored by ONE shared FGD embedder trio (GT-trained, framework-neutral)
— apples-to-apples fgd_{fe,bh,fbhe} + diversity. Writes PARITY_FGD.json.

Stage-resumable:  python scripts/parity_full_campaign.py <stage>
stages: torch_pred | torch_ref | gen_torch | jax | score   (default: next
incomplete). Torch runs on CPU (no CUDA in image), jax on the TPU.

Round-3 ablation knobs (judge item: isolate the documented training
deviations behind the per-part FGD gap):
  PARITY_VARIANT   legacy | ctx | topk | exact   (jax stage only)
      legacy: round-2 behavior — bernoulli context mask + bernoulli token
              curriculum, no grad clip
      ctx:    reference-exact context-mask bank only
      topk:   reference-exact exact-count token curriculum only
      exact:  both + grad-norm clip 5 (global-norm; the reference clips
              each module separately at 5 — global is the jax idiom and
              at least as tight) + exact epoch mapping
  PARITY_JAX_SEED  integer seed offset (default 0) for noise-band runs
  PARITY_TORCH_TAG artifact suffix + seed offset for a 2nd torch run
  PARITY_VQ_SRC    jax (default) | torch — 'torch' trains the jax
      predictor/refiner against the CONVERTED torch VQ
      (convert/torch_checkpoint.convert_vqvae of torch_vq_1500.pth), so
      BOTH systems predict the IDENTICAL code targets and decode through
      the IDENTICAL codebooks/decoder weights. Removes the VQ
      target-distribution confound (scripts/code_entropy_audit.py): each
      side otherwise learns its own VQ's codes, whose entropy differs.
      Arm name gets a '-tvq' suffix.
Artifacts: jax stages under experiments/parity_full/<variant>_s<seed>/;
score() aggregates every variant it finds into PARITY_FGD.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# Torch-side runs must never grab the TPU: the CPU queue exports
# PROBTALK_FORCE_CPU=1 (the JAX_PLATFORMS env var alone is overridden by
# the axon site hook — CLAUDE.md).
if os.environ.get("PROBTALK_FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

CACHE = os.environ.get("PROBTALK_CACHE", "/tmp/ptlk_cache_r2")
DIR = os.path.join(REPO, "experiments", "parity_full")
VQ_TORCH = os.path.join(REPO, "experiments", "parity", "torch_vq_1500.pth")
VQ_TORCH_FINAL = os.path.join(REPO, "experiments", "parity",
                              "torch_vq_1500_final.pth")
OUT = os.path.join(REPO, "PARITY_FGD.json")


def load_torch_vq():
    """The shared torch VQ, step-validated. Prefers the small final
    artifact; the full resume checkpoint is rewritten in place every 25
    steps, so a bare file-exists gate could feed the causal -tvq arms a
    mid-run state (ADVICE r3) — assert completion either way."""
    import torch

    path = VQ_TORCH_FINAL if os.path.exists(VQ_TORCH_FINAL) else VQ_TORCH
    saved = torch.load(path, map_location="cpu", weights_only=False)
    assert saved["step"] >= 1500, (
        f"torch VQ at step {saved['step']} < 1500 — still training? ({path})")
    return saved


def atomic_savez(path, **kw):
    """np.savez writes the target directly; a reader racing the writer (the
    TPU queue's incremental score vs the CPU queue's gen) can hit a partial
    zip. Write-then-rename makes every npz either absent or complete."""
    tmp = path + ".tmp.npz"
    np.savez(tmp, **kw)
    os.replace(tmp, path)
STEPS = int(os.environ.get("PARITY_STEPS", 600))
BS, WINDOW, AUD = 8, 180, 768
B_GEN = 8          # diversity samples at generation

VARIANT = os.environ.get("PARITY_VARIANT", "exact")
JAX_SEED = int(os.environ.get("PARITY_JAX_SEED", 0))
TORCH_TAG = os.environ.get("PARITY_TORCH_TAG", "")
VQ_SRC = os.environ.get("PARITY_VQ_SRC", "jax")

# (context_mask_mode, train_mask_mode, grad_clip, optimizer, init)
# optimizer: 'adam' = optax.adam(1e-4) (round-2 config, b2=0.999, no decay);
# 'adamw_ref' = the reference's ACTUAL optimizer — torch.optim.AdamW(lr,
# betas=[0.9, 0.99]) with its default weight_decay=0.01
# (predictor.py:112-118, refiner.py:122-129). The r3 ablation found the
# curricula deviations are not the bh-gap cause; the optimizer and the
# init are the remaining systematic differences.
# init: 'conv' = round-2 default (torch kaiming-uniform conv/dense kernels
# only); 'full' = additionally torch-default embedding N(0,1) + bias
# uniform (train/state.torch_full_reinit — the reference's tok_emb/
# class_embed start at ~10x flax's default scale, PTransformer.py:420-422).
VARIANTS = {
    "legacy": ("bernoulli", "bernoulli", None, "adam", "conv"),
    "ctx":    ("bank",      "bernoulli", None, "adam", "conv"),
    "topk":   ("bernoulli", "topk",      None, "adam", "conv"),
    "exact":  ("bank",      "topk",      5.0,  "adam", "conv"),
    # fully-faithful arm: curricula AND optimizer match the running torch
    "faith":  ("bank",      "topk",      5.0,  "adamw_ref", "conv"),
    # optimizer isolated on the round-2 curricula config
    "opt":    ("bernoulli", "bernoulli", 5.0,  "adamw_ref", "conv"),
    # init isolated on the round-2 config
    "init":   ("bernoulli", "bernoulli", None, "adam", "full"),
    # everything faithful at once: curricula + optimizer + init
    "faithinit": ("bank",   "topk",      5.0,  "adamw_ref", "full"),
}


def epoch_ratio_of(i: int) -> float:
    """The reference's curriculum value at campaign step i: steps map onto a
    100-'epoch' run, epoch_ratio = min(max(epoch/99, 0.5), 1)
    (predictor.py:255)."""
    return float(min(max(int(i * 100 / STEPS) / 99, 0.5), 1.0))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def load_data():
    from probtalk_tpu.cli.data_build import build_cache, load_cached_clips
    from probtalk_tpu.data.dataset import WindowedDataset

    build_cache("/root/reference/demo_audio", CACHE,
                ["oliver", "chemistry", "seth", "conan"],
                "/root/reference/data_utils/hand_component.json",
                audio_feat="mfcc")
    clips, mean, std = load_cached_clips(CACHE)
    for c in clips:                                # 64-d MFCC -> 768-d
        if c.aud_feat.shape[-1] != AUD:
            c.aud_feat = np.tile(c.aud_feat, (1, AUD // c.aud_feat.shape[-1]))
    ds = WindowedDataset(clips, window=WINDOW, stride=6, mean=mean, std=std)
    return clips, mean, std, ds


def batch_stream(ds, n, seed0=0):
    out, seed = [], seed0
    while len(out) < n:
        for b in ds.batches(BS, seed=seed):
            out.append(b)
            if len(out) == n:
                break
        seed += 1
    return out


def device_batch_stream(dds, n, seed0=0):
    """Device-resident twin of batch_stream: same windows, same rng
    (``index_batches`` consumes the generator bit-identically to
    ``batches``, tests/test_device_dataset.py), but each step's data
    dependency is a ~64-byte index upload instead of a ~6 MB tensor
    H2D over the tunnel — the host batch build dominated arm wall-clock
    (~2.6 s/step vs ~0.1 s device compute)."""
    seed, count = seed0, 0
    while True:
        for b in dds.fbhe_batches(BS, seed=seed):
            yield b
            count += 1
            if count == n:
                return
        seed += 1


def torch_bat(b, epoch=0):
    import torch

    return {
        "poses": torch.from_numpy(b["poses"].transpose(0, 2, 1)),
        "expression": torch.from_numpy(b["expression"].transpose(0, 2, 1)),
        "aud_feat": torch.from_numpy(b["aud_feat"].transpose(0, 2, 1)),
        "speaker": torch.from_numpy(b["speaker"].astype(np.int64)),
        "epoch": epoch,
        "fm_dict": None,   # refiner.__call__ reads (and ignores) it
    }


def make_args(infer=False):
    return argparse.Namespace(gpu="cpu", infer=infer, save_dir="/tmp",
                              exp_name="parity", speakers=["oliver"],
                              resume=False, pretrained_pth=None)


def torch_config():
    from reference_loader import load_reference, patch_tf_convs, ref_import

    assert load_reference()
    patch_tf_convs()
    from reference_loader import patch_torch2_compat

    patch_torch2_compat()
    cfg = ref_import("trainer.config").load_JsonConfig(
        "/root/reference/config/transformer.json")
    cfg.Data.data_root = "/root/reference/demo_audio"
    vq_wrap = os.path.join(DIR, "vq_for_wrappers.pth")
    if not os.path.exists(vq_wrap):
        import torch

        os.makedirs(DIR, exist_ok=True)
        saved = load_torch_vq()
        torch.save({"generator": {"VQ": saved["state"]["VQ"]}},
                   vq_wrap + ".tmp")
        os.replace(vq_wrap + ".tmp", vq_wrap)
    cfg.Model.vq_path = vq_wrap
    return cfg


def train_torch_wrapper(kind: str):
    """kind: 'pred' | 'ref' — train the reference wrapper, resumable."""
    import torch
    from reference_loader import ref_import

    cfg = torch_config()
    mod = ref_import("nets.inpainting.predictor" if kind == "pred"
                     else "nets.inpainting.refiner")
    torch.manual_seed(hash(TORCH_TAG) % 10000 if TORCH_TAG else 0)
    wrapper = mod.TrainWrapper(make_args(), cfg)
    wrapper.device = torch.device("cpu")   # predictor.py:36 hardcodes 'cuda'
    ckpt = os.path.join(DIR, f"torch_{kind}_{STEPS}{TORCH_TAG}.pth")
    start = 0
    if os.path.exists(ckpt):
        saved = torch.load(ckpt, map_location="cpu", weights_only=False)
        wrapper.load_state_dict(saved["state"])
        start = saved["step"]
        log(f"torch_{kind}: resumed at step {start}")
    if start >= STEPS:
        return wrapper
    _, _, _, ds = load_data()
    stream = batch_stream(ds, STEPS, seed0=1 if kind == "pred" else 2)
    t0 = time.time()
    for i, b in enumerate(stream):
        if i < start:
            continue
        # reference epoch-based curricula: map steps onto a 100-"epoch" run
        _, ld = wrapper(torch_bat(b, epoch=int(i * 100 / STEPS)))
        if i % 25 == 0 or i == STEPS - 1:
            torch.save({"state": wrapper.state_dict(), "step": i + 1},
                       ckpt + ".tmp")
            os.replace(ckpt + ".tmp", ckpt)
        if i % 100 == 0 or i == STEPS - 1:
            keys = [k for k in ld if "loss" in k][:3]
            log(f"torch_{kind} step {i}: " + ", ".join(
                f"{k}={float(ld[k]):.4f}" for k in keys))
    log(f"torch_{kind} trained in {time.time()-t0:.0f}s")
    torch.save({"state": wrapper.state_dict(), "step": STEPS}, ckpt + ".tmp")
    os.replace(ckpt + ".tmp", ckpt)
    write_final_wrapper_ckpt(kind)
    return wrapper


def write_final_wrapper_ckpt(kind: str):
    """Distill the (large, in-place-rewritten) resume checkpoint into the
    small durable ``torch_{kind}_{STEPS}{TAG}_final.pth`` (state only,
    written atomically once step==STEPS) — the artifact harvest_evidence.sh
    commits so converted_e2e.py stays reproducible after the experiments/
    wipe (ADVICE r3 applied the same split to the VQ side)."""
    import torch

    ckpt = os.path.join(DIR, f"torch_{kind}_{STEPS}{TORCH_TAG}.pth")
    final = os.path.join(DIR, f"torch_{kind}_{STEPS}{TORCH_TAG}_final.pth")
    if os.path.exists(final) or not os.path.exists(ckpt):
        return
    saved = torch.load(ckpt, map_location="cpu", weights_only=False)
    if saved["step"] < STEPS:
        return
    # drop the optimizer moments (predictor.py:134 'generator_optim' et al.
    # — 2/3 of the bytes); the converters only read the module sub-dicts
    state = {k: v for k, v in saved["state"].items() if "optim" not in k}
    torch.save({"state": state, "step": saved["step"]}, final + ".tmp")
    os.replace(final + ".tmp", final)
    log(f"torch_{kind} final artifact -> {final}")


def gen_torch():
    """Sliding-window generation with the torch wrappers -> npz per clip."""
    import torch
    from reference_loader import ref_import

    cfg = torch_config()
    pred_mod = ref_import("nets.inpainting.predictor")
    ref_mod = ref_import("nets.inpainting.refiner")
    torch.manual_seed(0)
    pred = pred_mod.TrainWrapper(make_args(infer=True), cfg)
    refi = ref_mod.TrainWrapper(make_args(infer=True), cfg)
    pred.device = refi.device = torch.device("cpu")
    for w, kind in ((pred, "pred"), (refi, "ref")):
        saved = torch.load(
            os.path.join(DIR, f"torch_{kind}_{STEPS}{TORCH_TAG}.pth"),
            map_location="cpu", weights_only=False)
        assert saved["step"] >= STEPS, (kind, saved["step"])
        w.load_state_dict(saved["state"])

    clips, mean, std, _ = load_data()
    from probtalk_tpu.core import body_parts

    idx = body_parts.c_index(True)
    outs, gen_seconds = {}, 0.0
    # per-clip resume: CPU generation can exceed one run's time budget
    part = os.path.join(DIR, "gen_torch_parts" + TORCH_TAG)
    os.makedirs(part, exist_ok=True)
    with torch.no_grad():
        for clip in clips:
            pf = os.path.join(part, f"{clip.name}.npz")
            if os.path.exists(pf):
                z = np.load(pf)
                outs[clip.name] = z["gen"]
                gen_seconds += float(z["seconds"])
                log(f"torch gen {clip.name}: resumed")
                continue
            full = (np.concatenate([clip.poses, clip.expression], -1)
                    - mean) / std
            gt = np.concatenate([full[:, :6], full[:, :330][:, idx],
                                 full[:, 330:]], -1).T[None]  # (1, C, T)
            t = gt.shape[-1]
            aud = torch.from_numpy(
                clip.aud_feat.T[None].astype(np.float32))     # (1, Ca, T)
            text = torch.zeros((1, 768, t))
            gt_t = torch.from_numpy(gt.astype(np.float32)).repeat(B_GEN, 1, 1)
            mask = torch.zeros((B_GEN, 1, t))
            import math

            n_slices = 1 + math.ceil((t - 180) / 150)
            pred_out, clip_seconds = None, 0.0
            id_t = torch.tensor([int(clip.speaker)])
            for i in range(n_slices):        # test_holisticbody.py:240-261
                s = 0 if i == 0 else 150 + 180 * (i - 1)
                e = 180 if i == 0 else 150 + 180 * i
                p0, dt0 = pred.infer_on_batch(aud=aud[..., s:e],
                                              text=text[..., s:e],
                                              id=id_t, B=B_GEN,
                                              gt_poses=gt_t[..., s:e],
                                              mask=mask[..., s:e])
                r0, dt1 = refi.infer_on_batch(aud=aud[..., s:e], B=B_GEN,
                                              id=id_t.repeat(B_GEN),
                                              gt_poses=gt_t[..., s:e],
                                              mask=mask[..., s:e],
                                              pred_poses=p0)
                clip_seconds += dt0 + dt1
                if pred_out is None:
                    pred_out = r0
                else:
                    pred_out = torch.cat([pred_out, r0[..., 30:]], -1)
                gt_t[..., s:e] = r0
                mask[..., s:e] = 1
            gen_seconds += clip_seconds
            outs[clip.name] = pred_out.numpy().transpose(0, 2, 1)  # (B,T,C)
            atomic_savez(pf, gen=outs[clip.name], seconds=clip_seconds)
            log(f"torch gen {clip.name}: {outs[clip.name].shape} "
                f"({clip_seconds:.1f}s)")
    atomic_savez(os.path.join(DIR, f"gen_torch{TORCH_TAG}.npz"),
                 gen_seconds=gen_seconds, **outs)
    log(f"torch generation total {gen_seconds:.1f}s (CPU)")


def train_and_gen_jax():
    """Fresh jax predictor+refiner at the same steps/batches; generate.

    Honors PARITY_VARIANT/PARITY_JAX_SEED (see module docstring).

    Resume unit: the WHOLE ARM (its gen npz). Intermediate orbax state
    saves were removed — on this 1-core host serializing a ~600 MB
    TrainState takes 10+ minutes, dwarfing the ~10 min of 600-step TPU
    compute it would protect; an interrupted arm just reruns."""
    vname = VARIANT + ("-tvq" if VQ_SRC == "torch" else "")
    npz = os.path.join(DIR, f"gen_jax_{vname}_s{JAX_SEED}.npz")
    if os.path.exists(npz):
        log(f"jax arm {vname} s{JAX_SEED}: gen npz exists, skipping")
        return

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from probtalk_tpu.models.vqvae import VQVAE
    from probtalk_tpu.train.stages import (
        PredictorStage, RefinerStage, make_predictor_train_step,
        make_refiner_train_step,
    )
    from probtalk_tpu.train.state import create_train_state
    from probtalk_tpu.train.trainer import Checkpointer
    from probtalk_tpu.core import body_parts

    clips, mean, std, ds = load_data()
    idx = body_parts.c_index(True)

    def fbhe(b):
        return np.concatenate([b["poses"][..., :6], b["poses"][..., idx],
                               b["expression"]], -1)

    # the jax side of the SAME VQ pair (parity_campaign steps_1500).
    # VQ training itself needs 8x-divisible windows (the 8x-downsampled
    # code grid must decode back to the window length), so the 180-frame
    # campaign windows are cropped to 176 here — exactly the reference's
    # own config split (vq.json trains at 176, transformer.json at 180).
    vq = VQVAE(in_dim=376, embedding_dim=512, num_codes=128, groups=4,
               hiddens=1024, res_layers=2)
    x0 = jnp.zeros((BS, WINDOW, 376), jnp.float32)
    x0_vq = jnp.zeros((BS, 176, 376), jnp.float32)
    if VQ_SRC == "torch":
        # the CONVERTED torch VQ: both systems now share code targets,
        # codebooks, and the decode path bit-for-bit (golden converter,
        # tests/test_torch_parity.py) — isolates predictor/refiner
        # training dynamics from the VQ stage.
        from probtalk_tpu.convert.torch_checkpoint import convert_vqvae

        saved = load_torch_vq()
        vq_vars = jax.tree.map(jnp.asarray, convert_vqvae(saved["state"]["VQ"]))
        log("torch vq converted -> jax (shared code targets)")
    else:
        vq_state = create_train_state(vq, (x0_vq,), jax.random.key(0),
                                      optax.adam(1e-4),
                                      init_kwargs={"train": True})
        vq_ck = Checkpointer(os.path.join(DIR, "jax_vq"))
        restored, _ = vq_ck.restore(vq_state)
        if restored is None:
            stream = batch_stream(ds, 1500, seed0=0)
            from probtalk_tpu.train.steps import make_vq_train_step

            step = make_vq_train_step(vq, donate=False)
            key = jax.random.key(1)
            for i, b in enumerate(stream):
                key, k = jax.random.split(key)
                vq_state, m = step(
                    vq_state, {"poses_fbhe": jnp.asarray(fbhe(b)[:, :176])}, k)
            vq_ck.save(0, vq_state, wait=True)
            log("jax vq trained (1500 steps, parity batches)")
        else:
            vq_state = restored
            log("jax vq restored")
        vq_vars = {"params": vq_state.params, **vq_state.mutables}

    ctx_mode, tok_mode, clip_norm, opt, init_style = VARIANTS[VARIANT]
    koff = 100 * JAX_SEED
    if opt == "adamw_ref":
        tx = optax.adamw(1e-4, b1=0.9, b2=0.99, weight_decay=0.01)
    else:
        tx = optax.adam(1e-4)
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    log(f"jax variant={VARIANT} seed={JAX_SEED}: ctx={ctx_mode} "
        f"tok={tok_mode} clip={clip_norm} opt={opt} init={init_style}")

    pred = PredictorStage(mot_dim=376, num_code=128, groups=4, aud_dim=AUD,
                          train_mask_mode=tok_mode)
    mask0 = jnp.zeros((BS, WINDOW, 1), jnp.float32)
    codes0 = jnp.zeros((BS, 23, 4), jnp.int32)
    spk0 = jnp.zeros((BS,), jnp.int32)
    aud0 = jnp.zeros((BS, WINDOW, AUD), jnp.float32)
    pstate = create_train_state(pred, (x0, codes0, mask0, spk0, aud0),
                                jax.random.key(2 + koff), tx,
                                init_kwargs={"train": True},
                                torch_init=init_style)
    from probtalk_tpu.data.device_dataset import DeviceWindowedDataset

    dds = DeviceWindowedDataset(clips, mean, std, window=WINDOW, stride=6)
    # zero_rows=64 is the reference's literal `mask[:64] = 0`
    # (predictor.py:226): at this campaign's bs=8 it unconditions ALL rows
    # — exactly what the torch wrappers being compared against do. Pinned
    # so every arm (including ones run after the framework default became
    # batch-proportional) keeps identical semantics.
    pstep = make_predictor_train_step(pred, vq, vq_vars, donate=False,
                                      context_mask_mode=ctx_mode,
                                      context_zero_rows=64)
    key = jax.random.key(3 + koff)
    for i, b in enumerate(device_batch_stream(dds, STEPS, seed0=1)):
        key, k = jax.random.split(key)
        b["epoch_ratio"] = np.float32(epoch_ratio_of(i))
        pstate, m = pstep(pstate, b, k)
        if i % 100 == 0 or i == STEPS - 1:
            log(f"jax pred step {i}: ce {float(m['loss']):.4f}")

    ref = RefinerStage(in_dim=376, aud_dim=AUD)
    rstate = create_train_state(ref, (x0, aud0, mask0, spk0),
                                jax.random.key(4 + koff), tx,
                                init_kwargs={"train": True},
                                torch_init=init_style)
    rstep = make_refiner_train_step(ref, vq, vq_vars, donate=False,
                                    context_mask_mode=ctx_mode,
                                    context_zero_rows=64)
    key = jax.random.key(5 + koff)
    for i, b in enumerate(device_batch_stream(dds, STEPS, seed0=2)):
        key, k = jax.random.split(key)
        rstate, m = rstep(rstate, b, k)
        if i % 100 == 0 or i == STEPS - 1:
            log(f"jax ref step {i}: loss {float(m['loss']):.4f}")

    # generation through the compiled streaming path
    from probtalk_tpu.streaming import make_streaming_generate
    from probtalk_tpu.eval.harness import device_sync

    gen = make_streaming_generate(vq, vq_vars, pred, pstate, ref, rstate,
                                  window=180, overlap=30)
    outs, gen_seconds = {}, 0.0
    key = jax.random.key(7 + koff)
    for clip in clips:
        key, k = jax.random.split(key)
        aud = jnp.asarray(clip.aud_feat)[None].repeat(B_GEN, 0)
        spk = jnp.full((B_GEN,), int(clip.speaker), jnp.int32)
        device_sync(gen(key, aud, spk))          # warm per shape
        t0 = time.perf_counter()
        out = gen(k, aud, spk)
        device_sync(out)
        gen_seconds += time.perf_counter() - t0
        outs[clip.name] = np.asarray(out)
        log(f"jax gen {clip.name}: {outs[clip.name].shape}")
    atomic_savez(os.path.join(DIR, f"gen_jax_{vname}_s{JAX_SEED}.npz"),
                 gen_seconds=gen_seconds, **outs)
    log(f"jax generation total {gen_seconds:.2f}s (TPU, warm)")


def score():
    """ONE shared embedder trio scores both systems' generations vs GT."""
    import jax.numpy as jnp

    from probtalk_tpu.cli.test_holistic import build_embedders
    from probtalk_tpu.core import body_parts
    from probtalk_tpu.eval.fgd import FGDEvaluator
    from probtalk_tpu.eval.harness import unfold_windows
    from probtalk_tpu.eval import metrics as M

    clips, mean, std, _ = load_data()
    idx = body_parts.c_index(True)
    embed_dir = os.path.join(REPO, "experiments", "demo_ckpt")
    extract = build_embedders(clips, mean, std, ckpt_dir=embed_dir)

    results = {"config": {"steps": STEPS, "vq_steps": 1500, "batch_size": BS,
                          "window": WINDOW, "B_gen": B_GEN,
                          "embedders": "shared GT-trained trio "
                                       "(experiments/demo_ckpt/emb_*)",
                          "variants": dict(VARIANTS)}}
    import glob

    sides = {}
    for f in sorted(glob.glob(os.path.join(DIR, "gen_torch*.npz"))):
        tag = os.path.basename(f)[len("gen_torch"):-len(".npz")]
        sides["torch" + tag] = f
    if os.path.exists(os.path.join(DIR, "gen_jax.npz")):   # round-2 run
        sides["jax_legacy_r2"] = os.path.join(DIR, "gen_jax.npz")
    for f in sorted(glob.glob(os.path.join(DIR, "gen_jax_*.npz"))):
        sides["jax_" + os.path.basename(f)[len("gen_jax_"):-len(".npz")]] = f
    for side, path in sides.items():
        z = np.load(path)
        ev = FGDEvaluator(extract)
        divs = []
        for clip in clips:
            gen = z[clip.name]
            full = (np.concatenate([clip.poses, clip.expression], -1)
                    - mean) / std
            gt = np.concatenate([full[:, :6], full[:, :330][:, idx],
                                 full[:, 330:]], -1)
            t = min(gen.shape[1], gt.shape[0])
            ev.push_samples(unfold_windows(gen[:, :t]),
                            unfold_windows(gt[:t]))
            divs.append(M.diversity(gen[:, :t]))
        entry = {"diversity": float(np.mean(divs)),
                 "gen_seconds": float(z["gen_seconds"])}
        for which in ("fe", "bh", "fbhe"):
            fd, fl1 = ev.get_scores(which)
            entry[f"fgd_{which}"] = fd
            entry[f"featdist_{which}"] = fl1
        results[side] = entry
        log(f"{side}: " + json.dumps(entry))
    json.dump(results, open(OUT, "w"), indent=2)
    log(f"wrote {OUT}")


STAGES = {"torch_pred": lambda: train_torch_wrapper("pred"),
          "torch_ref": lambda: train_torch_wrapper("ref"),
          "gen_torch": gen_torch,
          "jax": train_and_gen_jax,
          "score": score}

if __name__ == "__main__":
    os.makedirs(DIR, exist_ok=True)
    which = sys.argv[1:] or list(STAGES)
    for name in which:
        log(f"=== stage {name} ===")
        STAGES[name]()
