"""Long-horizon training campaign: 50k total steps on the demo corpus.

VERDICT r2 item 2: prove the framework holds up past toy scale — 20k VQ +
15k predictor + 15k refiner steps (the reference's envelope is 100 epochs
x batch 128, config/transformer.json:66-77), tracking:
  * per-stage loss curves
  * PQ codebook health: per-group usage fraction + perplexity from the
    EMA cluster statistics (dead-codebook detection)
  * gradient norms (divergence detection)
  * FGD(fe/bh/fbhe) every FGD_EVERY refiner steps through the compiled
    streaming generator, scored by the shared GT-trained embedder trio

Telemetry appends to experiments/long_campaign/telemetry.jsonl; summary to
LONG_CAMPAIGN.json. Step-granular resume: wall-clock-cadence checkpoints (StepCkpt.SAVE_SECS), safe to kill/restart at any point.

Run (daemon): nohup setsid python scripts/long_campaign.py &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF = "/root/reference"
CACHE = os.environ.get("PROBTALK_CACHE", "/tmp/ptlk_cache_r2")
# LC_SEED: campaign seed (repeatability evidence). Seed 0 is the canonical
# round-4 run (LONG_CAMPAIGN.json); any other seed trains in its own
# directory with disjoint RNG streams and writes LONG_CAMPAIGN_s{N}.json,
# so runs never mix checkpoints or telemetry.
SEED = int(os.environ.get("LC_SEED", 0))
_SFX = f"_s{SEED}" if SEED else ""
DIR = os.path.join(REPO, "experiments", f"long_campaign{_SFX}")
TELEMETRY = os.path.join(DIR, "telemetry.jsonl")
OUT = os.path.join(REPO, f"LONG_CAMPAIGN{_SFX}.json")
EMB_DIR = os.path.join(REPO, "experiments", "demo_ckpt")

STEPS_VQ = int(os.environ.get("LC_STEPS_VQ", 20000))
STEPS_PRED = int(os.environ.get("LC_STEPS_PRED", 15000))
STEPS_REF = int(os.environ.get("LC_STEPS_REF", 15000))
LOG_EVERY = 250
FGD_EVERY = int(os.environ.get("LC_FGD_EVERY", 2500))
BS, WINDOW, AUD = 8, 176, 64


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def emit(rec: dict):
    rec["t"] = time.time()
    with open(TELEMETRY, "a") as f:
        f.write(json.dumps(rec) + "\n")


def flush_summary(summary: dict, partial: bool = True):
    """Write LONG_CAMPAIGN.json NOW (atomically), not only at the end — a
    campaign killed by session end must still leave its evidence (round 3
    lost the whole 50k run this way). Curves digest: the full FGD track +
    every LOG_EVERY'th loss point, small enough to commit."""
    curves = {}
    if os.path.exists(TELEMETRY):
        for line in open(TELEMETRY):
            r = json.loads(line)
            curves.setdefault(r["stage"], []).append(r)
    out = dict(summary)
    out["partial"] = partial
    out["n_telemetry"] = {k: len(v) for k, v in curves.items()}
    out["fgd_curve"] = curves.get("fgd", [])
    out["loss_tail"] = {k: v[-3:] for k, v in curves.items() if k != "fgd"}
    tmp = OUT + ".tmp"
    json.dump(out, open(tmp, "w"), indent=2)
    os.replace(tmp, OUT)


def codebook_health(mutables) -> dict:
    """Usage + perplexity per group from the PQ EMA cluster stats
    (quant/pq.py PQState; the health signals the reference's EMA update
    maintains implicitly via dead-code restart, vqvae_modules.py:494-534)."""
    st = mutables["quant"]["pq"]
    counts = np.asarray(st.ema_counts, np.float64)          # (G, K) hidden
    tot = counts.sum(-1, keepdims=True) + 1e-12
    p = counts / tot
    perp = np.exp(-(p * np.log(p + 1e-12)).sum(-1))         # (G,)
    usage = (p > 1.0 / (4 * p.shape[-1])).mean(-1)          # active codes
    return {"perplexity": [round(float(x), 2) for x in perp],
            "usage": [round(float(x), 3) for x in usage]}


# Training-scheme stamp: the campaign is step-resumable ACROSS processes,
# so a code change to the train-step defaults (context-mask mode/zero_rows,
# per-step RNG derivation, masking curriculum) between runs would silently
# train a hybrid checkpoint matching neither scheme. Stamp the scheme on
# first run; refuse to resume under a different one.
SCHEME = {
    "ctx_mask_mode": "bank", "ctx_zero_rows": "bs//2",
    "token_mask": "topk", "rng": "fold_in(key, step)",
    "producer_contract": "index-stream replay", "window": WINDOW, "bs": BS,
}


def check_scheme():
    p = os.path.join(DIR, "scheme.json")
    if os.path.exists(p):
        old = json.load(open(p))
        if old != SCHEME:
            raise SystemExit(
                f"train-step scheme changed mid-campaign:\n  stamped {old}\n"
                f"  current {SCHEME}\nresuming would mix schemes in one "
                f"checkpoint — wipe {DIR} to restart under the new scheme")
    else:
        json.dump(SCHEME, open(p, "w"))


class StepCkpt:
    """Step-granular resume for one stage (flat-npz FastCkpt: orbax
    serialization of a ~600 MB TrainState is 10+ min on this 1-core
    host — longer than the compute between saves; FastCkpt is seconds).

    Saves are WALL-CLOCK driven (``maybe_save``): round 4 lost two pred
    chunks because the fixed 1000-step cadence outlasted the ~10 min
    session chunk budget (LONG_CAMPAIGN_s1.json loss_tail showed step
    250 -> restart at 0 twice). A 60 s timer bounds the replay cost of
    any kill to one minute of compute regardless of steps/s."""

    SAVE_SECS = 60.0

    def __init__(self, name):
        from probtalk_tpu.train.fast_ckpt import FastCkpt

        self.ck = FastCkpt(os.path.join(DIR, name))
        self.name = name
        self._last = time.time()

    def maybe_save(self, step, state, final=False):
        if final or time.time() - self._last >= self.SAVE_SECS:
            self.ck.save(step, state)
            self._last = time.time()

    def restore(self, state):
        restored, step = self.ck.restore(state)
        if restored is None:
            return state, 0
        # Commit the restored host-numpy leaves to device ONCE. Without
        # this, a skip-resumed stage keeps numpy leaves in every downstream
        # jit argument, and each call re-streams the whole state over the
        # tunnel (~10 s/step for the 468 MB VQ state — observed as a
        # <1 step/s pred stage after a vq skip-resume).
        import jax

        restored = jax.device_put(restored)
        log(f"{self.name}: resumed at step {step + 1}")
        return restored, step + 1

    def save(self, step, state):
        self.ck.save(step, state)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    os.makedirs(DIR, exist_ok=True)
    check_scheme()
    log(f"backend: {jax.default_backend()} seed: {SEED}")

    def K(n):
        """Campaign RNG stream: disjoint per LC_SEED (init + step keys)."""
        return jax.random.key(SEED * 1000 + n)

    from probtalk_tpu.cli.data_build import build_cache, load_cached_clips
    from probtalk_tpu.data.dataset import WindowedDataset

    build_cache(f"{REF}/demo_audio", CACHE,
                ["oliver", "chemistry", "seth", "conan"],
                f"{REF}/data_utils/hand_component.json", audio_feat="mfcc")
    clips, mean, std = load_cached_clips(CACHE)
    ds = WindowedDataset(clips, window=WINDOW, stride=6, mean=mean, std=std)
    log(f"{len(clips)} clips, {len(ds)} windows")

    # Batch producer ladder (all three are bit-identical,
    # tests/test_device_dataset.py + test_native_loader.py):
    #   1. device-resident corpus (HBM gather, ~64 B/step over the tunnel —
    #      the ~2.5 MB/step H2D transfer is what dominates a 50k-step run)
    #   2. C++ native producer (VERDICT item 5; 3x the python gather)
    #   3. python WindowedDataset
    producer = "python"
    try:
        from probtalk_tpu.data.device_dataset import DeviceWindowedDataset

        dds = DeviceWindowedDataset(clips, mean, std, window=WINDOW, stride=6)
        producer = "device"
    except Exception as e:
        log(f"device dataset unavailable ({e})")
        packed = os.path.join(DIR, "packed_fbhe.ptlk")
        try:
            from probtalk_tpu.data.native_loader import (NativeLoader,
                                                         pack_dataset)

            if not os.path.exists(packed):
                pack_dataset(packed, clips, mean, std)
            assert NativeLoader(packed, window=WINDOW, stride=6,
                                batch=BS).num_batches() > 0
            producer = "native"
        except Exception as e2:
            log(f"native loader unavailable ({e2}); python batches")
    log(f"batch producer: {producer}")

    def batches(seed):
        """Yields THUNKS: resume skips replay only the (host-side, numpy)
        index stream — the device gather / batch build happens at call
        time, so fast-forwarding 19k steps costs microseconds each, not a
        tunnel round trip each."""
        while True:
            if producer == "device":
                for cids, starts in dds.host.index_batches(BS, seed=seed):
                    yield lambda c=cids, s=starts: dds.gather(c, s)
            elif producer == "native":
                for b in NativeLoader(packed, window=WINDOW, stride=6,
                                      batch=BS, seed=seed):
                    yield lambda b=b: b
            else:
                for b in ds.fbhe_batches(BS, seed=seed):
                    yield lambda b=b: b
            seed += 1

    from probtalk_tpu.models.vqvae import VQVAE
    from probtalk_tpu.train.state import create_train_state, adamw
    from probtalk_tpu.train.steps import make_vq_train_step, make_eval_recon_fn
    from probtalk_tpu.train.stages import (
        PredictorStage, RefinerStage, make_predictor_train_step,
        make_refiner_train_step,
    )

    summary = {"steps": {"vq": STEPS_VQ, "pred": STEPS_PRED,
                         "ref": STEPS_REF},
               "batch": BS, "window": WINDOW}

    # ---------------- stage 1: PQ-VAE (20k) ----------------
    vq = VQVAE(in_dim=376, embedding_dim=512, num_codes=128, groups=4,
               hiddens=1024, res_layers=2)
    x0 = jnp.zeros((BS, WINDOW, 376), jnp.float32)
    vq_state = create_train_state(vq, (x0,), K(0), adamw(1e-4),
                                  init_kwargs={"train": True})
    ck = StepCkpt("vq")
    vq_state, start = ck.restore(vq_state)
    if start < STEPS_VQ:
        step = make_vq_train_step(vq, donate=False)
        it, key = batches(SEED * 1000), K(1)
        t0 = time.time()
        for i in range(STEPS_VQ):
            thunk = next(it)
            if i < start:
                continue
            k = jax.random.fold_in(key, i)   # O(1) resume, no split chain
            b = thunk()
            vq_state, m = step(
                vq_state, {"poses_fbhe": jnp.asarray(b["poses_fbhe"])}, k)
            if i % LOG_EVERY == 0 or i == STEPS_VQ - 1:
                health = codebook_health(vq_state.mutables)
                rec = {"stage": "vq", "step": i,
                       "loss": round(float(m["loss"]), 4),
                       "rec": round(float(m["rec_loss"]), 4),
                       **health}
                emit(rec)
                log(f"vq {i}: loss {rec['loss']} perp {health['perplexity']}"
                    f" usage {health['usage']}")
            ck.maybe_save(i, vq_state, final=i == STEPS_VQ - 1)
        log(f"vq stage done in {time.time()-t0:.0f}s")
    vq_vars = {"params": vq_state.params, **vq_state.mutables}
    summary["vq_health_final"] = codebook_health(vq_state.mutables)

    # capacity eval is deterministic given the final vq state — skip the
    # 21-batch recon sweep on skip-resumed chunks (it cost whole minutes
    # of a 10-min session chunk when the 1-core host was loaded)
    prev = json.load(open(OUT)) if os.path.exists(OUT) else {}
    if start >= STEPS_VQ and "vq_capacity_l1" in prev:
        summary["vq_capacity_l1"] = prev["vq_capacity_l1"]
    else:
        recon = make_eval_recon_fn(vq)
        cap = [float(recon(vq_state, jnp.asarray(b["poses_fbhe"]))[1])
               for b in ds.fbhe_batches(BS, seed=99, shuffle=False)]
        summary["vq_capacity_l1"] = round(float(np.mean(cap)), 4)
    log(f"vq capacity {summary['vq_capacity_l1']}")
    flush_summary(summary)

    # ---------------- stage 2: predictor (15k) ----------------
    pred = PredictorStage(mot_dim=376, num_code=128, groups=4, aud_dim=AUD)
    mask0 = jnp.zeros((BS, WINDOW, 1), jnp.float32)
    codes0 = jnp.zeros((BS, 22, 4), jnp.int32)
    spk0 = jnp.zeros((BS,), jnp.int32)
    aud0 = jnp.zeros((BS, WINDOW, AUD), jnp.float32)
    pstate = create_train_state(pred, (x0, codes0, mask0, spk0, aud0),
                                K(2), adamw(1e-4),
                                init_kwargs={"train": True})
    ck = StepCkpt("pred")
    pstate, start = ck.restore(pstate)
    if start < STEPS_PRED:
        pstep = make_predictor_train_step(pred, vq, vq_vars, donate=False)
        it, key = batches(SEED * 1000 + 100), K(3)
        t0 = time.time()
        for i in range(STEPS_PRED):
            thunk = next(it)
            if i < start:
                continue
            k = jax.random.fold_in(key, i)
            b = thunk()
            # reference curriculum mapped onto the step budget
            er = np.float32(min(max(int(i * 100 / STEPS_PRED) / 99, 0.5), 1))
            batch = {"poses_fbhe": jnp.asarray(b["poses_fbhe"]),
                     "aud_feat": jnp.asarray(b["aud_feat"]),
                     "speaker": jnp.asarray(b["speaker"]),
                     "epoch_ratio": er}
            pstate, m = pstep(pstate, batch, k)
            if i % LOG_EVERY == 0 or i == STEPS_PRED - 1:
                rec = {"stage": "pred", "step": i,
                       "ce": round(float(m["loss"]), 4),
                       "code_acc": round(float(m["code_acc"]), 4),
                       "grad_norm": round(float(m["grad_norm"]), 3)}
                emit(rec)
                log(f"pred {i}: ce {rec['ce']} acc {rec['code_acc']}")
            ck.maybe_save(i, pstate, final=i == STEPS_PRED - 1)
        log(f"pred stage done in {time.time()-t0:.0f}s")
    flush_summary(summary)

    # ---------------- stage 3: refiner (15k) + FGD track ----------------
    ref = RefinerStage(in_dim=376, aud_dim=AUD)
    rstate = create_train_state(ref, (x0, aud0, mask0, spk0),
                                K(4), adamw(1e-4),
                                init_kwargs={"train": True})
    ck = StepCkpt("ref")
    rstate, start = ck.restore(rstate)

    # FGD scorer over the shared GT-trained embedder trio
    fgd_ready = os.path.isdir(os.path.join(EMB_DIR, "emb_fbhe"))
    if fgd_ready:
        from probtalk_tpu.cli.test_holistic import build_embedders
        from probtalk_tpu.eval.fgd import FGDEvaluator
        from probtalk_tpu.eval.harness import unfold_windows
        from probtalk_tpu.streaming import make_streaming_generate
        from probtalk_tpu.core import body_parts

        extract = build_embedders(clips, mean, std, ckpt_dir=EMB_DIR)
        idx = body_parts.c_index(True)

        def fgd_now(rs, key):
            gen = make_streaming_generate(vq, vq_vars, pred, pstate, ref, rs,
                                          window=176, overlap=30)
            ev = FGDEvaluator(extract)
            for clip in clips:
                key, k = jax.random.split(key)
                aud = jnp.asarray(clip.aud_feat)[None].repeat(8, 0)
                spk = jnp.full((8,), int(clip.speaker), jnp.int32)
                out = np.asarray(gen(k, aud, spk))
                full = (np.concatenate([clip.poses, clip.expression], -1)
                        - mean) / std
                gt = np.concatenate([full[:, :6], full[:, :330][:, idx],
                                     full[:, 330:]], -1)
                t = min(out.shape[1], gt.shape[0])
                ev.push_samples(unfold_windows(out[:, :t]),
                                unfold_windows(gt[:t]))
            return {w: round(ev.get_scores(w)[0], 4)
                    for w in ("fe", "bh", "fbhe")}

    if start < STEPS_REF:
        rstep = make_refiner_train_step(ref, vq, vq_vars, donate=False)
        it, key = batches(SEED * 1000 + 200), K(5)
        t0 = time.time()
        for i in range(STEPS_REF):
            thunk = next(it)
            if i < start:
                continue
            k = jax.random.fold_in(key, i)
            b = thunk()
            batch = {"poses_fbhe": jnp.asarray(b["poses_fbhe"]),
                     "aud_feat": jnp.asarray(b["aud_feat"]),
                     "speaker": jnp.asarray(b["speaker"])}
            rstate, m = rstep(rstate, batch, k)
            if i % LOG_EVERY == 0 or i == STEPS_REF - 1:
                rec = {"stage": "ref", "step": i,
                       "loss": round(float(m["loss"]), 4),
                       "grad_norm": round(float(m["grad_norm"]), 3)}
                emit(rec)
                log(f"ref {i}: loss {rec['loss']}")
            if fgd_ready and i and (i % FGD_EVERY == 0 or i == STEPS_REF - 1):
                key, k = jax.random.split(key)
                scores = fgd_now(rstate, k)
                emit({"stage": "fgd", "step": i, **scores})
                log(f"FGD @ ref {i}: {scores}")
                flush_summary(summary)
            ck.maybe_save(i, rstate, final=i == STEPS_REF - 1)
        log(f"ref stage done in {time.time()-t0:.0f}s")

    if fgd_ready:
        summary["fgd_final"] = fgd_now(rstate, K(77))
        log(f"final FGD: {summary['fgd_final']}")

    flush_summary(summary, partial=False)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
