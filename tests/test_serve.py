"""Serving engine + HTTP server tests.

The key property: a served session reproduces the offline compiled
streaming schedule (`streaming.make_streaming_generate`) exactly — same
window grid, same key-split pattern — and its output is independent of
which other sessions were micro-batched with it (per-sample vmapped RNG).
"""

import http.client
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probtalk_tpu.models.vqvae import VQVAE
from probtalk_tpu.serve.engine import EngineBusy, ServingEngine, SessionClosed
from probtalk_tpu.serve.server import MotionServer
from probtalk_tpu.streaming import make_streaming_generate
from probtalk_tpu.train.stages import PredictorStage, RefinerStage
from probtalk_tpu.train.state import create_train_state, adamw

CM, CA, W, OV = 40, 24, 16, 4
STEP = W - OV


@pytest.fixture(scope="module")
def stages():
    vq = VQVAE(in_dim=CM, embedding_dim=32, num_codes=8, groups=4, hiddens=32,
               res_layers=1)
    x = jnp.zeros((1, W, CM), jnp.float32)
    vq_vars = vq.init({"params": jax.random.key(0), "quant": jax.random.key(1)},
                      x, train=True)
    pred = PredictorStage(mot_dim=CM, num_code=8, groups=4, dec_layers=1,
                          aud_dim=CA)
    mask = jnp.zeros((1, W, 1), jnp.float32)
    codes0 = jnp.zeros((1, W // 8, 4), jnp.int32)
    spk = jnp.zeros((1,), jnp.int32)
    aud = jnp.zeros((1, W, CA), jnp.float32)
    pred_state = create_train_state(pred, (x, codes0, mask, spk, aud),
                                    jax.random.key(2), adamw(1e-4),
                                    init_kwargs={"train": True})
    ref = RefinerStage(in_dim=CM, aud_dim=CA, layers=1)
    ref_state = create_train_state(ref, (x, aud, mask, spk), jax.random.key(3),
                                   adamw(1e-4), init_kwargs={"train": True})
    return vq, vq_vars, pred, pred_state, ref, ref_state


def make_engine(stages, **kw):
    kw.setdefault("window", W)
    kw.setdefault("overlap", OV)
    return ServingEngine(*stages, **kw)


@pytest.fixture(scope="module")
def solo_eng(stages):
    """ONE shared max_batch=1 engine: sessions are independent, so every
    solo comparison reuses the same compiled step."""
    return make_engine(stages, max_batch=1)


@pytest.fixture(scope="module")
def gen(stages):
    return make_streaming_generate(*stages, window=W, overlap=OV)


def offline(gen, seed, aud_np, speaker=0):
    out = gen(jax.random.key(seed), jnp.asarray(aud_np)[None],
              jnp.full((1,), speaker, jnp.int32))
    return np.asarray(out[0])


def solo_run(eng, seed, aud_np, speaker=0, chunk=7):
    sid = eng.create_session(speaker=speaker, seed=seed)
    parts = []
    for i in range(0, len(aud_np), chunk):
        parts.append(eng.feed(sid, aud_np[i:i + chunk]))
    parts.append(eng.flush(sid))
    return np.concatenate(parts, axis=0)


class TestEngineOffline:
    @pytest.mark.parametrize("t", [10, W, 45])
    def test_matches_offline_streaming(self, solo_eng, gen, rng, t):
        aud = rng.normal(size=(t, CA)).astype(np.float32)
        served = solo_run(solo_eng, seed=5, aud_np=aud)
        ref = offline(gen, seed=5, aud_np=aud)
        assert served.shape == ref.shape == (t, CM)
        np.testing.assert_allclose(served, ref, rtol=2e-4, atol=2e-4)

    def test_output_length_equals_features(self, solo_eng, rng):
        for t in (1, STEP, W, W + 1, W + STEP, 50):
            aud = rng.normal(size=(t, CA)).astype(np.float32)
            out = solo_run(solo_eng, seed=0, aud_np=aud, chunk=5)
            assert out.shape == (t, CM), t


class TestMicroBatching:
    def test_batched_equals_solo(self, stages, solo_eng, rng):
        """Sessions batched together produce exactly what they produce
        alone (per-sample vmapped keys), including with bucket padding."""
        specs = [(11, 0, 30), (12, 1, 45), (13, 2, 20)]   # (seed, spk, T)
        auds = {s: rng.normal(size=(t, CA)).astype(np.float32)
                for s, _, t in specs}

        eng = make_engine(stages, max_batch=8)
        sids = {seed: eng.create_session(speaker=spk, seed=seed)
                for seed, spk, _ in specs}
        # interleave feeds without pumping, then one batched pump
        out = {seed: [] for seed, _, _ in specs}
        for lo in range(0, 45, 9):
            for seed, spk, t in specs:
                a = auds[seed][lo:lo + 9]
                if len(a):
                    eng.feed(sids[seed], a, pump=False)
            eng.pump_all()
            for seed, _, _ in specs:
                out[seed].append(eng.poll(sids[seed]))
        for seed, spk, t in specs:
            out[seed].append(eng.flush(sids[seed]))

        assert eng.stats["batches"] < eng.stats["windows"], eng.stats
        for seed, spk, t in specs:
            batched = np.concatenate(out[seed], axis=0)
            solo = solo_run(solo_eng, seed=seed, aud_np=auds[seed],
                            speaker=spk)
            assert batched.shape == solo.shape == (t, CM)
            np.testing.assert_allclose(batched, solo, rtol=2e-4, atol=2e-4)

    def test_bucket_padding_counted(self, stages, rng):
        eng = make_engine(stages, max_batch=8)
        sids = [eng.create_session(seed=i) for i in range(3)]
        for sid in sids:
            eng.feed(sid, rng.normal(size=(W, CA)).astype(np.float32),
                     pump=False)
        eng.pump_all()
        assert eng.stats == {"windows": 3, "batches": 1, "pad_rows": 1,
                             "expired": 0}

    def test_postprocess_applied(self, stages, rng):
        eng = make_engine(stages, postprocess=lambda x: x * 0.0)
        sid = eng.create_session()
        out = eng.feed(sid, rng.normal(size=(W, CA)).astype(np.float32))
        assert out.shape == (W, CM) and np.all(out == 0.0)
        eng.flush(sid)


class TestSessionLifecycle:
    def test_closed_session_raises(self, solo_eng, rng):
        sid = solo_eng.create_session()
        solo_eng.feed(sid, rng.normal(size=(5, CA)).astype(np.float32))
        solo_eng.flush(sid)
        with pytest.raises(SessionClosed):
            solo_eng.feed(sid, np.zeros((1, CA), np.float32))
        with pytest.raises(SessionClosed):
            solo_eng.flush(sid)
        assert solo_eng.active_sessions() == 0

    def test_empty_flush(self, solo_eng):
        sid = solo_eng.create_session()
        out = solo_eng.flush(sid)
        assert out.shape == (0, CM)

    def test_max_sessions_backpressure(self, stages):
        eng = make_engine(stages, max_sessions=2)
        a, b = eng.create_session(), eng.create_session()
        with pytest.raises(EngineBusy):
            eng.create_session()
        eng.flush(a)
        c = eng.create_session()          # slot freed by flush
        eng.flush(b), eng.flush(c)

    def test_latency_stats(self, solo_eng, rng):
        sid = solo_eng.create_session()
        solo_eng.feed(sid, rng.normal(size=(W, CA)).astype(np.float32))
        solo_eng.flush(sid)
        st = solo_eng.latency_stats()
        assert st["batch_ms_p50"] > 0 and st["batch_ms_p95"] >= st["batch_ms_p50"]
        assert st["batch_ms_p99"] >= st["batch_ms_p95"]
        assert st["queue_ms_p50"] >= 0 and st["queue_ms_p99"] >= 0


class TestMeshServing:
    """Scale-out serving: the window batch shards over the mesh's data
    axis (sessions are independent — no cross-lane collectives)."""

    def test_sharded_equals_unsharded(self, stages, solo_eng, rng):
        from probtalk_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(model=1)              # 8 virtual CPU devices
        eng = make_engine(stages, max_batch=8, mesh=mesh)
        specs = [(31, 0, 40), (32, 1, 25), (33, 0, 16)]
        outs = {}
        for seed, spk, t in specs:
            aud = np.random.default_rng(seed).normal(
                size=(t, CA)).astype(np.float32)
            sid = eng.create_session(speaker=spk, seed=seed)
            parts = [eng.feed(sid, aud[:10], pump=False)]
            eng.feed(sid, aud[10:], pump=False)
            eng.pump_all()
            parts.append(eng.poll(sid))
            parts.append(eng.flush(sid))
            outs[seed] = np.concatenate(parts, axis=0)
        # bucket rounded up to the 8-wide data axis => pad rows counted
        assert eng.stats["pad_rows"] > 0
        for seed, spk, t in specs:
            aud = np.random.default_rng(seed).normal(
                size=(t, CA)).astype(np.float32)
            solo = solo_run(solo_eng, seed=seed, aud_np=aud, speaker=spk)
            assert outs[seed].shape == solo.shape == (t, CM)
            np.testing.assert_allclose(outs[seed], solo, rtol=2e-4,
                                       atol=2e-4)

    def test_max_batch_must_cover_mesh(self, stages):
        from probtalk_tpu.parallel.mesh import make_mesh

        with pytest.raises(ValueError, match="multiple of"):
            make_engine(stages, max_batch=4, mesh=make_mesh(model=1))


class TestHTTPServer:
    def test_end_to_end(self, stages, solo_eng, rng):
        eng = make_engine(stages, max_batch=4)
        server = MotionServer(eng, port=0, pump_interval=0.005).start()
        try:
            results = {}

            def client(tag, seed, t):
                conn = http.client.HTTPConnection("127.0.0.1", server.port)
                conn.request("POST", "/v1/sessions",
                             body=json.dumps({"speaker": 0, "seed": seed}))
                sid = json.loads(conn.getresponse().read())["id"]
                aud = np.random.default_rng(seed).normal(
                    size=(t, CA)).astype(np.float32)
                chunks = []
                for lo in range(0, t, 11):
                    a = aud[lo:lo + 11]
                    conn.request("POST", f"/v1/sessions/{sid}/feed",
                                 body=a.tobytes(),
                                 headers={"X-Shape": f"{a.shape[0]},{CA}"})
                    r = conn.getresponse()
                    shape = tuple(int(x)
                                  for x in r.getheader("X-Shape").split(","))
                    chunks.append(np.frombuffer(r.read(),
                                                np.float32).reshape(shape))
                conn.request("POST", f"/v1/sessions/{sid}/flush")
                r = conn.getresponse()
                shape = tuple(int(x) for x in r.getheader("X-Shape").split(","))
                chunks.append(np.frombuffer(r.read(), np.float32).reshape(shape))
                conn.close()
                results[tag] = np.concatenate(chunks, axis=0)

            threads = [threading.Thread(target=client, args=(i, 20 + i, 30))
                       for i in range(2)]
            for th in threads:
                th.start()
            for th in threads:
                th.join()

            for i in range(2):
                assert results[i].shape == (30, CM)
                assert np.all(np.isfinite(results[i]))
            # served output matches the engine run directly with that seed
            aud0 = np.random.default_rng(20).normal(size=(30, CA)).astype(
                np.float32)
            solo = solo_run(solo_eng, seed=20, aud_np=aud0)
            np.testing.assert_allclose(results[0], solo, rtol=2e-4, atol=2e-4)

            conn = http.client.HTTPConnection("127.0.0.1", server.port)
            conn.request("GET", "/healthz")
            health = json.loads(conn.getresponse().read())
            assert health["ok"] and health["sessions"] == 0
            conn.close()
        finally:
            server.stop()


# ---------------------------------------------------------------------------
# Raw-audio ingestion (on-device frontend)
# ---------------------------------------------------------------------------

SR, FPS = 160, 16          # 10 samples per motion frame (test-sized)
UPF = SR // FPS


class _FrameLocalFrontend:
    """Tiny frontend module: (B, S) waveform -> (B, n_frames, CA) features
    via a per-frame reshape + Dense. Frame-LOCAL by construction, so
    per-window encoding == whole-clip encoding — letting the raw-audio
    engine be compared exactly against the feature-mode engine."""

    class Mod(__import__("flax").linen.Module):
        ca: int = CA

        @__import__("flax").linen.compact
        def __call__(self, wav, n_frames=None, train=False):
            import flax.linen as fnn

            b, s = wav.shape
            x = wav.reshape(b, n_frames, s // n_frames)
            return fnn.Dense(self.ca, name="proj")(x)

    def __init__(self):
        self.mod = self.Mod()
        self.vars = self.mod.init(jax.random.key(9),
                                  jnp.zeros((1, W * UPF), jnp.float32),
                                  n_frames=W)

    def host_features(self, wav: np.ndarray) -> np.ndarray:
        n = len(wav) // UPF
        out = self.mod.apply(self.vars, jnp.asarray(wav[None, :n * UPF]),
                             n_frames=n)
        return np.asarray(out[0])


@pytest.fixture(scope="module")
def frontend():
    return _FrameLocalFrontend()


def raw_engine(stages, frontend, **kw):
    kw.setdefault("max_batch", 1)
    kw.setdefault("sr", SR)
    return make_engine(stages, frontend=(frontend.mod, frontend.vars),
                       fps=FPS, **kw)


class TestRawAudioServing:
    def test_matches_feature_mode(self, stages, solo_eng, frontend, rng):
        """Raw-PCM sessions (frontend on device) == feature sessions fed
        the same frontend's host-computed features."""
        eng = raw_engine(stages, frontend)
        for t_frames in (10, W, 45):
            wav = rng.normal(size=(t_frames * UPF,)).astype(np.float32) * 0.1
            sid = eng.create_session(speaker=1, seed=3)
            parts = []
            for lo in range(0, len(wav), 77):
                parts.append(eng.feed(sid, wav[lo:lo + 77]))
            parts.append(eng.flush(sid))
            raw_out = np.concatenate(parts, axis=0)

            feats = frontend.host_features(wav)
            ref_out = solo_run(solo_eng, seed=3, aud_np=feats, speaker=1)
            assert raw_out.shape == ref_out.shape == (t_frames, CM)
            np.testing.assert_allclose(raw_out, ref_out, rtol=2e-4, atol=2e-4)

    def test_fractional_frame_truncation(self, stages, frontend, rng):
        """Samples that don't fill a whole frame are dropped (floor), like
        the offline feature fn's int(S/sr*fps)."""
        eng = raw_engine(stages, frontend)
        wav = rng.normal(size=(7 * UPF + 4,)).astype(np.float32)
        sid = eng.create_session()
        eng.feed(sid, wav)
        out = eng.flush(sid)
        assert out.shape == (7, CM)

    def test_int16_wire(self, stages, frontend, rng):
        """wav_dtype=int16 halves the upload; output within quantization
        tolerance of the f32 engine."""
        wav = (rng.normal(size=(30 * UPF,)) * 0.2).astype(np.float32)
        f32_eng = raw_engine(stages, frontend)
        sid = f32_eng.create_session(seed=4)
        a = np.concatenate([f32_eng.feed(sid, wav), f32_eng.flush(sid)], 0)

        i16_eng = raw_engine(stages, frontend, wav_dtype=np.int16)
        sid = i16_eng.create_session(seed=4)
        # feed pre-quantized PCM just like a wire client would
        pcm = np.clip(wav * 32768.0, -32768, 32767).astype(np.int16)
        b = np.concatenate([i16_eng.feed(sid, pcm), i16_eng.flush(sid)], 0)
        assert a.shape == b.shape == (30, CM)
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-3)

    def test_batched_raw_equals_solo(self, stages, frontend, rng):
        eng = raw_engine(stages, frontend, max_batch=4)
        solo = raw_engine(stages, frontend)
        wavs = {s: rng.normal(size=(t * UPF,)).astype(np.float32) * 0.1
                for s, t in ((21, 30), (22, 18))}
        sids = {s: eng.create_session(seed=s) for s in wavs}
        for s, wav in wavs.items():
            eng.feed(sids[s], wav, pump=False)
        eng.pump_all()
        for s, wav in wavs.items():
            got = np.concatenate([eng.poll(sids[s]), eng.flush(sids[s])], 0)
            sid2 = solo.create_session(seed=s)
            want = np.concatenate([solo.feed(sid2, wav),
                                   solo.flush(sid2)], 0)
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_rejects_bad_geometry_and_shapes(self, stages, frontend):
        with pytest.raises(ValueError, match="whole samples"):
            raw_engine(stages, frontend, sr=161)
        eng = raw_engine(stages, frontend)
        sid = eng.create_session()
        with pytest.raises(ValueError, match="waveform"):
            eng.feed(sid, np.zeros((5, CA), np.float32))


class TestEmitDtype:
    def test_f16_transfer_close_to_f32(self, stages, solo_eng, rng):
        eng = make_engine(stages, max_batch=1, emit_dtype=jnp.float16)
        aud = rng.normal(size=(W + STEP, CA)).astype(np.float32)
        got = solo_run(eng, seed=6, aud_np=aud)
        want = solo_run(solo_eng, seed=6, aud_np=aud)
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)


class TestIdleGC:
    def test_abandoned_session_expires(self, stages, rng):
        eng = make_engine(stages, max_batch=1, max_sessions=1,
                          idle_ttl=0.05)
        import time as _time

        sid = eng.create_session()
        eng.feed(sid, rng.normal(size=(3, CA)).astype(np.float32),
                 pump=False)
        _time.sleep(0.08)
        eng.pump_all()                       # GC sweep
        assert eng.stats.get("expired") == 1
        assert eng.active_sessions() == 0
        with pytest.raises(SessionClosed):
            eng.poll(sid)
        eng.flush(eng.create_session())      # slot freed for a new session

    def test_active_session_survives(self, stages, rng):
        eng = make_engine(stages, max_batch=1, idle_ttl=10.0)
        sid = eng.create_session()
        out = eng.feed(sid, rng.normal(size=(W, CA)).astype(np.float32))
        eng.pump_all()
        assert out.shape == (W, CM)
        assert eng.active_sessions() == 1
        eng.flush(sid)

    def test_ttl_zero_means_disabled(self, stages):
        """idle_ttl=0 (the natural CLI 'off' value) must disable GC, not
        expire every session on the next pump."""
        eng = make_engine(stages, max_batch=1, idle_ttl=0.0)
        assert eng.idle_ttl is None
        sid = eng.create_session()
        eng.pump_all()
        assert eng.active_sessions() == 1
        eng.flush(sid)

    def test_blocked_poll_is_not_idle(self, stages, rng):
        """A client blocked inside poll(timeout) stamps last_active only
        at entry; the GC sweep must not expire it mid-wait."""
        import threading as _threading
        import time as _time

        eng = make_engine(stages, max_batch=1, idle_ttl=0.05)
        sid = eng.create_session()
        eng.feed(sid, rng.normal(size=(3, CA)).astype(np.float32),
                 pump=False)
        got = {}

        def waiter():
            got["out"] = eng.poll(sid, timeout=0.5)

        th = _threading.Thread(target=waiter)
        th.start()
        _time.sleep(0.1)                      # > ttl, waiter still blocked
        eng.pump_all()                        # GC sweep must skip it
        assert eng.active_sessions() == 1
        th.join()
        assert got["out"].shape[1] == CM      # SessionClosed never raised
        eng.flush(sid)

    def test_stats_keys_fixed_at_init(self, stages):
        """/healthz dumps engine.stats without the lock: the pump thread
        must never insert keys at runtime (all keys seeded in __init__)."""
        eng = make_engine(stages, max_batch=1, idle_ttl=0.01)
        keys0 = set(eng.stats)
        assert "expired" in keys0
        sid = eng.create_session()
        import time as _time

        _time.sleep(0.03)
        eng.pump_all()
        assert eng.stats["expired"] == 1 and set(eng.stats) == keys0
        with pytest.raises(SessionClosed):
            eng.flush(sid)


class TestHostKeyData:
    def test_matches_device_key(self):
        from probtalk_tpu.serve.engine import _host_key_data

        for seed in (0, 1, 5, 123456789, 2**40 + 7, -1):
            want = np.asarray(jax.random.key_data(jax.random.key(seed)))
            np.testing.assert_array_equal(_host_key_data(seed), want)


class TestFaceStage:
    def test_face_splice_matches_composition(self, stages, rng):
        """Serving with ``face=(model, vars)`` == serving without the face
        stage + the ai1.py splice of the face generator run on the same
        window features (single-window clip, so no cross-window face
        context deviation; body channels must be bitwise-unchanged)."""
        from probtalk_tpu.models.face import FaceGenerator

        jd, ed = 3, 10
        face = FaceGenerator(jaw_dim=jd, expression_dim=ed, hidden=16)
        fvars = face.init(jax.random.key(7), jnp.zeros((1, W, CA)),
                          jnp.zeros((1,), jnp.int32))
        eng_f = make_engine(stages, max_batch=1, face=(face, fvars))
        eng_p = make_engine(stages, max_batch=1)
        aud = rng.normal(size=(W, CA)).astype(np.float32)
        got = solo_run(eng_f, seed=3, aud_np=aud, speaker=1)
        body = solo_run(eng_p, seed=3, aud_np=aud, speaker=1)
        f = np.asarray(face.apply(fvars, jnp.asarray(aud)[None],
                                  jnp.ones((1,), jnp.int32)))[0]
        want = np.concatenate(
            [f[:, :jd], body[:, jd: CM - ed], f[:, jd:]], axis=-1)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        # body channels ride through bitwise-identically (context feedback
        # carries the unspliced body, so the schedule is unchanged)
        np.testing.assert_array_equal(got[:, jd: CM - ed],
                                      body[:, jd: CM - ed])

    def test_face_multiwindow_finite(self, stages, rng):
        from probtalk_tpu.models.face import FaceGenerator

        face = FaceGenerator(jaw_dim=3, expression_dim=10, hidden=16)
        fvars = face.init(jax.random.key(8), jnp.zeros((1, W, CA)),
                          jnp.zeros((1,), jnp.int32))
        eng = make_engine(stages, max_batch=2, face=(face, fvars))
        t = W + 2 * STEP + 5
        aud = rng.normal(size=(t, CA)).astype(np.float32)
        out = solo_run(eng, seed=4, aud_np=aud)
        assert out.shape == (t, CM) and np.isfinite(out).all()


class TestResidentMode:
    """Device-resident lane state (``resident=True``): carried context
    tails + RNG key data live in device slot buffers, gather/scatter-
    updated inside the compiled step; the pump fetches only a 4-byte
    probe per batch. Must be output-identical to the host-carried path
    (same ``one`` program, same key chain — the carry just never leaves
    the device)."""

    def test_resident_equals_host_carried(self, stages, solo_eng, rng):
        eng = make_engine(stages, max_batch=4, resident=True,
                          resident_slots=4)
        specs = [(41, 0, 45), (42, 1, 30), (43, 0, 20)]   # (seed, spk, T)
        auds = {s: rng.normal(size=(t, CA)).astype(np.float32)
                for s, _, t in specs}
        sids = {s: eng.create_session(speaker=spk, seed=s)
                for s, spk, _ in specs}
        out = {s: [] for s, _, _ in specs}
        for lo in range(0, 45, 9):
            for s, _, _ in specs:
                a = auds[s][lo:lo + 9]
                if len(a):
                    eng.feed(sids[s], a, pump=False)
            eng.pump_all()
            for s, _, _ in specs:
                out[s].append(eng.poll(sids[s]))
        assert eng.stats["batches"] < eng.stats["windows"], eng.stats
        for s, spk, t in specs:
            out[s].append(eng.flush(sids[s]))
            got = np.concatenate(out[s], axis=0)
            want = solo_run(solo_eng, seed=s, aud_np=auds[s], speaker=spk)
            assert got.shape == want.shape == (t, CM)
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_slot_exhaustion_and_recycle(self, stages, rng):
        eng = make_engine(stages, max_batch=2, resident=True,
                          resident_slots=2)
        a = eng.create_session(seed=1)
        b = eng.create_session(seed=2)
        with pytest.raises(EngineBusy, match="resident slots"):
            eng.create_session(seed=3)
        # run windows through A so its slot holds real carried state
        aud = rng.normal(size=(W + STEP, CA)).astype(np.float32)
        first = np.concatenate([eng.feed(a, aud), eng.flush(a)], axis=0)
        # recycled slot: the new tenant's first window must mask the
        # previous tenant's stale tail/key — same seed => same output
        c = eng.create_session(seed=1)
        again = np.concatenate([eng.feed(c, aud), eng.flush(c)], axis=0)
        np.testing.assert_array_equal(first, again)
        eng.flush(b)
        assert len(eng._free_slots) == 2      # every slot returned

    def test_expired_session_frees_slot(self, stages, rng):
        import time as _time

        eng = make_engine(stages, max_batch=1, resident=True,
                          resident_slots=1, idle_ttl=0.05)
        eng.create_session(seed=0)
        _time.sleep(0.08)
        eng.pump_all()                        # GC sweep releases the slot
        assert eng.stats["expired"] == 1
        eng.flush(eng.create_session(seed=1))

    def test_cont_transfers_are_step_only(self, stages, rng):
        """Continuation windows must upload only the new ``step`` units
        (the overlap's audio is read back from the device slot buffer)
        AND emit only ``step`` frames (overlap trimmed on device): both
        transfer legs carry each unit exactly once."""
        eng = make_engine(stages, max_batch=1, resident=True,
                          resident_slots=1)
        seen = []
        real = eng._step_res_cont

        def spy(variables, *args):
            out = real(variables, *args)
            seen.append((args[4].shape, out[0].shape))   # aud_new, emit
            return out

        eng._step_res_cont = spy
        sid = eng.create_session(seed=0)
        aud = rng.normal(size=(W + STEP, CA)).astype(np.float32)
        eng.feed(sid, aud)                       # window 1 full, window 2 cont
        eng.flush(sid)
        assert seen, seen
        assert all(up[1] == STEP and em[1] == STEP for up, em in seen), seen

    def test_resident_rejects_mesh(self, stages):
        from probtalk_tpu.parallel.mesh import make_mesh

        with pytest.raises(ValueError, match="single-chip"):
            make_engine(stages, max_batch=8, resident=True,
                        mesh=make_mesh(model=1))

    def test_failed_step_before_dispatch_is_retryable(self, stages,
                                                      solo_eng, rng):
        """A step that fails BEFORE consuming the donated buffers must
        restore them: the retry then continues the same key/tail chain
        (same semantics as a host-carried retry)."""
        eng = make_engine(stages, max_batch=1, resident=True,
                          resident_slots=1)
        aud = rng.normal(size=(W + STEP, CA)).astype(np.float32)
        sid = eng.create_session(seed=5)
        out = [eng.feed(sid, aud[:W])]           # window 1 establishes carry
        real = eng._step_res_cont                # window 2 is a cont window
        eng._step_res_cont = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("transient"))
        with pytest.raises(RuntimeError, match="transient"):
            eng.feed(sid, aud[W:])               # window 2 fails pre-dispatch
        assert eng._state_bufs is not None       # carry restored
        eng._step_res_cont = real
        out.append(eng.feed(sid, np.zeros((0, CA), np.float32)))  # retry pump
        out.append(eng.flush(sid))
        got = np.concatenate(out, axis=0)
        want = solo_run(solo_eng, seed=5, aud_np=aud)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_failed_step_after_consume_closes_carried_sessions(
            self, stages, rng):
        """If the donated buffers WERE consumed when the step failed, the
        carry is unrecoverable for every slot: sessions with prior
        windows must close (clients see SessionClosed, never a silently
        wrong-context continuation); first-window sessions survive."""
        eng = make_engine(stages, max_batch=2, resident=True,
                          resident_slots=2)
        aud = rng.normal(size=(W + STEP, CA)).astype(np.float32)
        a = eng.create_session(seed=1)
        eng.feed(a, aud[:W])                     # a now carries state
        b = eng.create_session(seed=2)
        eng.feed(b, aud[:W - 1], pump=False)     # b not yet windowed
        real = eng._step_res_cont                # a's next window is cont

        def consume_then_fail(variables, *args):
            real(variables, *args)               # donates the bufs
            raise RuntimeError("post-dispatch loss")

        eng._step_res_cont = consume_then_fail
        eng.feed(a, aud[W:], pump=False)         # b stays below one window
        with pytest.raises(RuntimeError, match="post-dispatch"):
            eng.pump_all()
        eng._step_res_cont = real
        with pytest.raises(SessionClosed):       # a's carry is gone
            eng.poll(a)
        assert len(eng._free_slots) == 1         # a's slot returned
        # b never had device carry: it pumps through and flushes clean
        out = np.concatenate([eng.feed(b, aud[W - 1:W]),
                              eng.flush(b)], axis=0)
        assert out.shape == (W, CM) and np.isfinite(out).all()


class TestPumpDegradation:
    def test_persistent_pump_failure_flips_healthz(self, capsys):
        """A permanently failing engine must not burn the pump loop at
        100 Hz forever, and /healthz must flip unhealthy (503/ok:false)
        so load balancers drain the server."""
        import time as _time

        class BadEngine:
            stats = {"windows": 0}
            raw_audio = False

            def pump_all(self):
                raise RuntimeError("device lost")

            def active_sessions(self):
                return 0

            def latency_stats(self):
                return {}

        srv = MotionServer(BadEngine(), pump_interval=0.002).start()
        try:
            deadline = _time.time() + 10
            while _time.time() < deadline:
                conn = http.client.HTTPConnection("127.0.0.1", srv.port)
                conn.request("GET", "/healthz")
                r = conn.getresponse()
                body = json.loads(r.read())
                conn.close()
                if not body["ok"]:
                    assert r.status == 503
                    assert body["pump_errors"] >= 5
                    break
                _time.sleep(0.02)
            else:
                raise AssertionError("healthz never flipped unhealthy")
        finally:
            srv.stop()


class TestRobustness:
    def test_wrong_feature_dim_rejected_at_feed(self, solo_eng, rng):
        """A wrong-shaped client gets its own ValueError; the pump (and
        other sessions) never see the bad payload."""
        sid = solo_eng.create_session(seed=1)
        with pytest.raises(ValueError, match="feats must be"):
            solo_eng.feed(sid, rng.normal(size=(W, CA + 3)).astype(np.float32))
        with pytest.raises(ValueError, match="feats must be"):
            solo_eng.feed(sid, rng.normal(size=(W,)).astype(np.float32))
        # session still healthy afterwards
        out = np.concatenate(
            [solo_eng.feed(sid, rng.normal(size=(W, CA)).astype(np.float32)),
             solo_eng.flush(sid)], axis=0)
        assert out.shape == (W, CM)

    def test_long_stream_buffer_is_bounded(self, solo_eng, gen, rng):
        """Consumed input units are dropped: after many windows the
        session holds O(window) units, not the whole stream history —
        and the output still matches the offline generator exactly."""
        t = W + 6 * STEP                      # 7 windows
        aud = rng.normal(size=(t, CA)).astype(np.float32)
        sid = solo_eng.create_session(seed=9)
        parts = []
        for i in range(0, t, 5):
            parts.append(solo_eng.feed(sid, aud[i:i + 5]))
            s = solo_eng._sessions.get(sid)
            if s is not None:
                assert s.buffered().shape[0] <= W + 5
                assert s.trimmed + s.buffered().shape[0] == s.n_feat
        parts.append(solo_eng.flush(sid))
        out = np.concatenate(parts, 0)
        np.testing.assert_allclose(out, offline(gen, 9, aud),
                                   rtol=2e-4, atol=2e-4)

    def test_pump_thread_survives_engine_error(self, stages, rng):
        """A pump_all() exception must not kill the server's pump loop."""
        eng = make_engine(stages, max_batch=1)
        server = MotionServer(eng, pump_interval=0.005).start()
        try:
            orig, calls = eng.pump_all, []

            def boom():
                if not calls:
                    calls.append(1)
                    raise RuntimeError("injected")
                return orig()

            eng.pump_all = boom
            deadline = threading.Event()
            deadline.wait(0.05)               # let the pump hit the error
            assert server.pump_errors >= 1
            # the loop is still alive: a real session still gets frames
            sid = eng.create_session(seed=2)
            eng.feed(sid, rng.normal(size=(W, CA)).astype(np.float32),
                     pump=False)
            out = eng.poll(sid, timeout=2.0)
            assert out.shape[0] == W
            eng.flush(sid)
        finally:
            server.stop()
