"""End-to-end training campaign on the SHOW demo fixtures (real TPU).

Trains every stage of the ProbTalk pipeline from scratch on the ~8 demo
clips, then runs the holistic evaluation harness — the smallest complete
exercise of the whole framework: data build -> PQ-VAE -> predictor ->
refiner -> FGD embedder -> generation -> metrics. Writes EVAL_DEMO.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_demo_campaign.py
(~20 min on one v5e chip, dominated by XLA compiles.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
CACHE = os.environ.get("PROBTALK_CACHE", "/tmp/ptlk_cache_r2")
OUT_JSON = os.path.join(REPO, "EVAL_DEMO.json")
CKPT_DIR = os.environ.get("PROBTALK_CKPT_DIR",
                          os.path.join(REPO, "experiments", "demo_ckpt"))

STEPS_VQ = int(os.environ.get("STEPS_VQ", 1500))
STEPS_PRED = int(os.environ.get("STEPS_PRED", 1200))
STEPS_REF = int(os.environ.get("STEPS_REF", 1200))
STEPS_EMB = int(os.environ.get("STEPS_EMB", 600))
BS = 8
WINDOW = 176


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def maybe_restore(name, state):
    """Stage-granular resume: restore a finished stage's checkpoint if one
    exists so interrupted campaigns skip already-trained stages."""
    from probtalk_tpu.train.trainer import Checkpointer

    ckpt = Checkpointer(os.path.join(CKPT_DIR, name))
    if ckpt.latest_epoch() is not None:
        restored, _ = ckpt.restore(state)
        if restored is not None:
            log(f"{name}: restored checkpoint, skipping training")
            return restored, True
    return state, False


def save_stage(name, state):
    from probtalk_tpu.train.trainer import Checkpointer

    Checkpointer(os.path.join(CKPT_DIR, name)).save(0, state, wait=True)


def main():
    import jax
    import jax.numpy as jnp

    # persistent XLA compilation cache: reruns / resumed campaigns skip the
    # multi-minute TPU compiles
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    log(f"backend: {jax.default_backend()}")

    # ---------------- data ----------------
    from probtalk_tpu.cli.data_build import build_cache, load_cached_clips
    from probtalk_tpu.data.dataset import WindowedDataset

    build_cache(f"{REF}/demo_audio", CACHE,
                ["oliver", "chemistry", "seth", "conan"],
                f"{REF}/data_utils/hand_component.json", audio_feat="mfcc")
    clips, mean, std = load_cached_clips(CACHE)
    log(f"{len(clips)} clips cached")
    ds = WindowedDataset(clips, window=WINDOW, stride=6, mean=mean, std=std)
    log(f"{len(ds)} windows")

    def batches(seed):
        while True:
            for b in ds.fbhe_batches(BS, seed=seed):
                yield b
            seed += 1

    # ---------------- stage 1: PQ-VAE ----------------
    from probtalk_tpu.models.vqvae import VQVAE
    from probtalk_tpu.train.state import create_train_state, adamw
    from probtalk_tpu.train.steps import make_vq_train_step, make_eval_recon_fn

    vq = VQVAE(in_dim=376, embedding_dim=512, num_codes=128, groups=4,
               hiddens=1024, res_layers=2)
    x0 = jnp.zeros((BS, WINDOW, 376), jnp.float32)
    vq_state = create_train_state(vq, (x0,), jax.random.key(0), adamw(1e-4),
                                  init_kwargs={"train": True})
    key = jax.random.key(1)
    it = batches(0)
    vq_state, done = maybe_restore("vq", vq_state)
    if not done:
        step = make_vq_train_step(vq, donate=False)
        t0 = time.time()
        for i in range(STEPS_VQ):
            key, k = jax.random.split(key)
            vq_state, m = step(vq_state, {"poses_fbhe": jnp.asarray(next(it)["poses_fbhe"])}, k)
            if i in (0, STEPS_VQ // 2, STEPS_VQ - 1):
                log(f"vq step {i}: loss {float(m['loss']):.4f} rec {float(m['rec_loss']):.4f}")
        log(f"vq trained in {time.time()-t0:.0f}s")
        save_stage("vq", vq_state)
    vq_vars = {"params": vq_state.params, **vq_state.mutables}

    recon = make_eval_recon_fn(vq)
    cap = []
    for b in ds.fbhe_batches(BS, seed=99, shuffle=False):
        _, l1, _ = recon(vq_state, jnp.asarray(b["poses_fbhe"]))
        cap.append(float(l1))
    capacity = float(np.mean(cap))
    log(f"VQ capacity L1 (normalized units): {capacity:.4f}")

    # ---------------- stage 2: predictor ----------------
    from probtalk_tpu.train.stages import (
        PredictorStage, RefinerStage, make_predictor_train_step,
        make_refiner_train_step,
    )

    pred = PredictorStage(mot_dim=376, num_code=128, groups=4, aud_dim=64)
    mask0 = jnp.zeros((BS, WINDOW, 1), jnp.float32)
    codes0 = jnp.zeros((BS, 22, 4), jnp.int32)
    spk0 = jnp.zeros((BS,), jnp.int32)
    aud0 = jnp.zeros((BS, WINDOW, 64), jnp.float32)
    pred_state = create_train_state(pred, (x0, codes0, mask0, spk0, aud0),
                                    jax.random.key(2), adamw(1e-4),
                                    init_kwargs={"train": True})
    pred_state, done = maybe_restore("predictor", pred_state)
    if not done:
        pstep = make_predictor_train_step(pred, vq, vq_vars, donate=False)
        t0 = time.time()
        for i in range(STEPS_PRED):
            key, k = jax.random.split(key)
            b = next(it)
            batch = {"poses_fbhe": jnp.asarray(b["poses_fbhe"]),
                     "aud_feat": jnp.asarray(b["aud_feat"]),
                     "speaker": jnp.asarray(b["speaker"]),
                     "epoch_ratio": np.float32(min(max(i / STEPS_PRED, 0.5), 1.0))}
            pred_state, m = pstep(pred_state, batch, k)
            if i in (0, STEPS_PRED // 2, STEPS_PRED - 1):
                log(f"pred step {i}: ce {float(m['loss']):.4f} acc {float(m['code_acc']):.3f}")
        log(f"predictor trained in {time.time()-t0:.0f}s")
        save_stage("predictor", pred_state)

    # ---------------- stage 3: refiner ----------------
    ref = RefinerStage(in_dim=376, aud_dim=64)
    ref_state = create_train_state(ref, (x0, aud0, mask0, spk0),
                                   jax.random.key(3), adamw(1e-4),
                                   init_kwargs={"train": True})
    ref_state, done = maybe_restore("refiner", ref_state)
    if not done:
        rstep = make_refiner_train_step(ref, vq, vq_vars, donate=False)
        t0 = time.time()
        for i in range(STEPS_REF):
            key, k = jax.random.split(key)
            b = next(it)
            batch = {"poses_fbhe": jnp.asarray(b["poses_fbhe"]),
                     "aud_feat": jnp.asarray(b["aud_feat"]),
                     "speaker": jnp.asarray(b["speaker"])}
            ref_state, m = rstep(ref_state, batch, k)
            if i in (0, STEPS_REF // 2, STEPS_REF - 1):
                log(f"refiner step {i}: loss {float(m['loss']):.4f}")
        log(f"refiner trained in {time.time()-t0:.0f}s")
        save_stage("refiner", ref_state)

    # ---------------- FGD embedder ----------------
    from probtalk_tpu.models.embedding_net import EmbeddingNet
    from probtalk_tpu.train.stages_extra import make_embedder_train_step
    from probtalk_tpu.cli.test_holistic import unfold_windows, run_harness
    from probtalk_tpu.core import body_parts

    jaw_d = body_parts.each_dim(True)[0]
    exp_d = body_parts.each_dim(True)[3]
    cidx = body_parts.c_index(True)
    gt_windows = []
    for clip in clips:
        full = np.concatenate([clip.poses, clip.expression], -1)
        full = (full - mean) / std
        fbhe = np.concatenate([full[:, :jaw_d], full[:, :330][:, cidx],
                               full[:, 330:]], -1)
        gt_windows.append(unfold_windows(fbhe, 90, 30))
    gt_windows = np.concatenate(gt_windows).astype(np.float32)
    log(f"{len(gt_windows)} embedder windows")

    # three embedders: face ('fe': jaw+expression), body ('bh'), full ('fbhe')
    # — the reference's val_face/val_body/val trio (test_holisticbody.py:397-403)
    def part_slice(which, w):
        if which == "fe":
            return np.concatenate([w[..., :jaw_d], w[..., -exp_d:]], -1)
        if which == "bh":
            return w[..., jaw_d:-exp_d]
        return w

    extract_fns = {}
    for which in ("fe", "bh", "fbhe"):
        wins = part_slice(which, gt_windows)
        emb = EmbeddingNet(pose_dim=wins.shape[-1], n_frames=90)
        w0 = jnp.zeros((BS, 90, wins.shape[-1]), jnp.float32)
        emb_state = create_train_state(emb, (w0,), jax.random.key(4),
                                       adamw(1e-4), init_kwargs={"train": True})
        emb_state, done = maybe_restore(f"emb_{which}", emb_state)
        if not done:
            estep = make_embedder_train_step(emb, donate=False)
            erng = np.random.default_rng(0)
            for i in range(STEPS_EMB):
                key, k = jax.random.split(key)
                sel = erng.integers(0, len(wins), BS)
                emb_state, m = estep(emb_state, {"windows": jnp.asarray(wins[sel])}, k)
                if i == STEPS_EMB - 1:
                    log(f"embedder[{which}] final loss {float(m['loss']):.4f}")
            save_stage(f"emb_{which}", emb_state)
        emb_vars = {"params": emb_state.params, **emb_state.mutables}

        def make_extract(emb=emb, emb_vars=emb_vars, which=which):
            ex = jax.jit(lambda v, w: emb.apply(v, w, method=emb.extract))

            def extract(w):
                return np.asarray(ex(emb_vars, jnp.asarray(part_slice(which, w))))
            return extract

        extract_fns[which] = make_extract()

    # ---------------- harness (full metric suite, compiled streaming) ----
    from probtalk_tpu.pipeline import HolisticPipeline
    from probtalk_tpu.eval.fgd import FGDEvaluator
    from probtalk_tpu.cli.test_holistic import (
        load_smplx_model, streaming_generate_fn,
    )

    pipe = HolisticPipeline(vq, vq_vars, pred, pred_state, ref, ref_state,
                            window=WINDOW, overlap=26)
    evaluator = FGDEvaluator(extract_fns)
    smplx_model = load_smplx_model(synthetic=True)
    results = run_harness(streaming_generate_fn(pipe), clips, mean, std,
                          evaluator=evaluator, smplx_model=smplx_model, B=16)
    results["vq_capacity_l1"] = capacity
    results["steps"] = {"vq": STEPS_VQ, "pred": STEPS_PRED, "ref": STEPS_REF,
                        "emb": STEPS_EMB}
    log(json.dumps(results, indent=2, default=float))
    with open(OUT_JSON, "w") as f:
        json.dump(results, f, indent=2, default=float)
    log(f"wrote {OUT_JSON}")


if __name__ == "__main__":
    main()
