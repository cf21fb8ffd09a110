"""Serving CLI: stand up the streaming motion server over trained stages.

    python -m probtalk_tpu.cli.serve --config_file configs/transformer.json \
        --model_path <vq_ckpt_dir> \
        --body_model_path <predictor_ckpt_dir> <refiner_ckpt_dir> \
        --port 8080 --max_batch 64

Clients POST motion-fps audio-feature chunks (float32, ``X-Shape: T,Ca``)
to ``/v1/sessions/<id>/feed`` and receive motion frames back; concurrent
sessions are micro-batched into one compiled TPU program per window
(see ``probtalk_tpu/serve/``). The reference has no serving entry point —
its closest analogue is the one-shot ``scripts/demo.py``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_engine(config, norm_stats_path: str, vq_path=None,
                 predictor_path=None, refiner_path=None, max_batch: int = 64,
                 max_sessions=None, raw: bool = False, seed: int = 0,
                 pcm: bool = False, w2v_ckpt=None, w2v_arch: str = "wav2vec2",
                 wav_int16: bool = False, emit_f16: bool = False,
                 idle_ttl=None, face_path=None, w2v_f32: bool = False,
                 stage_f32: bool = False, resident: bool = False,
                 resident_slots: int = 256):
    """Stages via the demo's builder; returns a ready ServingEngine.

    pcm=True serves raw 16 kHz audio: the acoustic frontend (w2v_arch
    'wav2vec2' base or 'hubert' large) runs on device inside the batched
    window program. ``w2v_ckpt`` is the orbax dir written by
    ``cli/convert_checkpoint --stage wav2vec2|hubert``; without one the
    frontend is RANDOM-INIT (shape-complete only) and a warning is
    printed — the reference mount ships no pretrained weights.

    Defaults match the measured-best sweep arm (SERVE_SWEEP.json, real
    chip, round 5): 64 lanes, bf16 predictor/refiner compute (weights
    stay f32 in the checkpoints; stage_f32=True opts out)."""
    import jax.numpy as jnp

    from probtalk_tpu.cli.demo import build_pipeline
    from probtalk_tpu.serve.engine import ServingEngine

    pipe, mean, std = build_pipeline(
        config, norm_stats_path, vq_path=vq_path,
        predictor_path=predictor_path, refiner_path=refiner_path, seed=seed,
        stage_dtype=None if stage_f32 else jnp.bfloat16)

    postprocess = None
    if not raw:
        import jax.numpy as jnp
        from probtalk_tpu.core import body_parts, normalize
        from probtalk_tpu.core.rotation import d6_to_aa_flat

        idx = body_parts.c_index(True)
        jaw_d = body_parts.each_dim(True)[0]

        def postprocess(chunk: np.ndarray) -> np.ndarray:
            # normalized fbhe -> denormalized axis-angle (165) + expr (100),
            # the demo's output convention (cli/demo.py generate_motion)
            x = normalize.denormalize(jnp.asarray(chunk)[None], mean, std,
                                      shape="fbhe", idx=idx)[0]
            d6 = x[..., : jaw_d + 270]
            expr = x[..., -100:]
            aa = d6_to_aa_flat(d6.reshape(-1, 276)).reshape(-1, 138)
            full = body_parts.part2full(aa[None])[0]
            return np.asarray(jnp.concatenate([full, expr], -1))

    kw = {}
    if pcm:
        import jax
        import jax.numpy as jnp

        from probtalk_tpu.audio.wav2vec2 import Wav2Vec2Encoder

        # bf16 frontend compute is the measured-best serving config on TPU
        # (+5% end-to-end vs f32, bench.py matrix; norms/softmax stay f32,
        # deviation pinned by tests/test_wav2vec2.py). --w2v_f32 opts out.
        fdt = None if w2v_f32 else jnp.bfloat16
        if w2v_arch == "hubert":
            from probtalk_tpu.audio.hubert import HubertEncoder

            w2v = HubertEncoder(dtype=fdt)
        else:
            w2v = Wav2Vec2Encoder(dtype=fdt)
        if w2v_ckpt:
            import os as _os

            import orbax.checkpoint as ocp

            path = _os.path.join(_os.path.abspath(w2v_ckpt), "variables")
            w2v_vars = ocp.StandardCheckpointer().restore(path)
        else:
            print("WARNING: --pcm without --w2v_ckpt: Wav2Vec2 frontend is "
                  "random-init (shape-complete only)")
            w2v_vars = jax.jit(lambda r, x: w2v.init(r, x, n_frames=30))(
                jax.random.key(seed + 11), jnp.zeros((1, 16000), jnp.float32))
        kw.update(frontend=(w2v, w2v_vars),
                  wav_dtype=np.int16 if wav_int16 else np.float32)
    if emit_f16:
        import jax.numpy as jnp

        kw["emit_dtype"] = jnp.float16
    if face_path is not None:
        # dedicated jaw+expression generator joins the window program; its
        # output splices over the body stages' face channels (ai1.py:61-77)
        import jax
        import jax.numpy as jnp

        from probtalk_tpu.core import body_parts
        from probtalk_tpu.models.face import FaceGenerator
        from probtalk_tpu.train.state import adamw, create_train_state
        from probtalk_tpu.train.trainer import Checkpointer

        face = FaceGenerator(jaw_dim=body_parts.each_dim(True)[0])
        aud_dim = 768 if pcm else config.Data.aud.get("aud_feat_dim", 64)
        a0 = jnp.zeros((1, pipe.window, aud_dim), jnp.float32)
        fstate = create_train_state(face, (a0,), jax.random.key(seed + 21),
                                    adamw(1e-4),
                                    init_kwargs={"train": False})
        restored, _ = Checkpointer(face_path).restore(fstate)
        if restored is not None:
            fstate = restored
        else:
            print(f"WARNING: no face checkpoint at {face_path}: "
                  "face stage is random-init (shape-complete only)")
        kw["face"] = (face, {"params": fstate.params, **fstate.mutables})
    return ServingEngine(
        pipe.vq_model, pipe.vq_variables, pipe.predictor_stage,
        pipe.predictor_state, pipe.refiner_stage, pipe.refiner_state,
        window=pipe.window, overlap=pipe.overlap, max_batch=max_batch,
        max_sessions=max_sessions, postprocess=postprocess,
        idle_ttl=idle_ttl, resident=resident,
        resident_slots=resident_slots, **kw)


def main(argv=None):
    from probtalk_tpu.config import load_config
    from probtalk_tpu.serve.server import MotionServer

    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--model_path", default=None, help="VQ checkpoint dir")
    p.add_argument("--body_model_path", nargs="*", default=None,
                   help="predictor ckpt dir, refiner ckpt dir")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max_batch", type=int, default=64,
                   help="lane bucket width; 64 is the measured-best "
                        "throughput arm (SERVE_SWEEP.json: 11.5k frames/s "
                        "= 382x RT; drop to 8-16 for latency-sensitive "
                        "deployments)")
    p.add_argument("--max_sessions", type=int, default=None,
                   help="admission limit; extra session creates get 503")
    p.add_argument("--idle_ttl", type=float, default=300.0,
                   help="seconds of inactivity before an unflushed session "
                        "is garbage-collected (frees its max_sessions slot); "
                        "<=0 disables GC")
    p.add_argument("--pump_interval", type=float, default=0.01)
    p.add_argument("--raw", action="store_true",
                   help="emit normalized fbhe motion instead of "
                        "axis-angle + expression")
    p.add_argument("--pcm", action="store_true",
                   help="serve raw 16 kHz audio: run the Wav2Vec2 frontend "
                        "on device inside the batched window program")
    p.add_argument("--w2v_ckpt", default=None,
                   help="converted frontend checkpoint dir "
                        "(cli/convert_checkpoint --stage wav2vec2|hubert)")
    p.add_argument("--w2v_arch", default="wav2vec2",
                   choices=["wav2vec2", "hubert"],
                   help="frontend architecture the checkpoint matches")
    p.add_argument("--w2v_f32", action="store_true",
                   help="run the acoustic frontend in f32 (default bf16 "
                        "compute, the measured-best TPU serving config)")
    p.add_argument("--stage_f32", action="store_true",
                   help="run the predictor/refiner stacks in f32 (default "
                        "bf16 compute, the measured-best arm at >=32 lanes; "
                        "SERVE_SWEEP.json)")
    p.add_argument("--resident", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="device-resident lane state (default ON, the "
                        "measured-best serving arm — SERVE_SWEEP.json "
                        "all_bf16_resident): per-session context tail + "
                        "RNG key live in device slot buffers; the pump "
                        "fetches a 4-byte probe per batch instead of "
                        "round-tripping every lane's tail over the "
                        "host<->device link. Single-chip; caps concurrent "
                        "sessions at --resident_slots. --no-resident "
                        "restores the host-carried (mesh-capable, "
                        "unbounded-session) path")
    p.add_argument("--resident_slots", type=int, default=256,
                   help="device slot buffer rows = max concurrent sessions "
                        "in --resident mode (each holds an (overlap, C) "
                        "context tail + RNG key + the overlap's input "
                        "audio, ~77 KB at production raw-int16 sizes)")
    p.add_argument("--wav_int16", action="store_true",
                   help="int16 PCM wire (halves the audio upload)")
    p.add_argument("--emit_f16", action="store_true",
                   help="float16 device->host output transfer")
    p.add_argument("--face_model_path", default=None,
                   help="s2g_face checkpoint dir: run the dedicated face "
                        "generator inside the window program and splice its "
                        "jaw+expression over the body output (ai1.py "
                        "composition)")
    args = p.parse_args(argv)

    config = load_config(args.config_file)
    norm_stats = os.environ.get(
        "PROBTALK_NORM_STATS", "/root/reference/data_utils/norm_stats.npy")
    body = args.body_model_path or [None, None]
    engine = build_engine(
        config, norm_stats, vq_path=args.model_path, predictor_path=body[0],
        refiner_path=body[1] if len(body) > 1 else None,
        max_batch=args.max_batch, max_sessions=args.max_sessions,
        raw=args.raw, pcm=args.pcm, w2v_ckpt=args.w2v_ckpt,
        w2v_arch=args.w2v_arch, wav_int16=args.wav_int16,
        w2v_f32=args.w2v_f32, stage_f32=args.stage_f32,
        emit_f16=args.emit_f16, idle_ttl=args.idle_ttl,
        face_path=args.face_model_path, resident=args.resident,
        resident_slots=args.resident_slots)
    server = MotionServer(engine, host=args.host, port=args.port,
                          pump_interval=args.pump_interval).start()
    print(f"serving on http://{args.host}:{server.port} "
          f"(window={engine.window}, max_batch={engine.max_batch})")
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
