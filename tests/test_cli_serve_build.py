"""Wiring tests for cli/serve.py build_engine's acoustic-frontend config.

The serving frontend defaults to bf16 compute (the measured-best TPU
config, bench.py dtype matrix) with --w2v_f32 as the opt-out; these tests
pin that flag threading without building the real pipeline (heavy), by
stubbing the pipeline builder, the engine, and the frontend init.
"""

from __future__ import annotations

import types

import jax.numpy as jnp
import pytest

from probtalk_tpu.cli import serve as serve_cli


class _PipeStub:
    vq_model = object()
    vq_variables = {}
    predictor_stage = object()
    predictor_state = object()
    refiner_stage = object()
    refiner_state = object()
    window = 180
    overlap = 30


class _EngineStub:
    """Records the kwargs build_engine hands to ServingEngine."""

    def __init__(self, *args, **kw):
        self.args = args
        self.kw = kw


@pytest.fixture()
def patched(monkeypatch):
    import probtalk_tpu.audio.hubert as hubert_mod
    import probtalk_tpu.audio.wav2vec2 as w2v_mod
    import probtalk_tpu.cli.demo as demo_mod
    import probtalk_tpu.serve.engine as engine_mod

    monkeypatch.setattr(demo_mod, "build_pipeline",
                        lambda *a, **k: (_PipeStub(), None, None))
    monkeypatch.setattr(engine_mod, "ServingEngine", _EngineStub)
    # skip the real (expensive) random-init; variables are irrelevant here.
    # HubertEncoder is a Wav2Vec2Encoder factory, so one patch covers both.
    monkeypatch.setattr(w2v_mod.Wav2Vec2Encoder, "init",
                        lambda self, *a, **k: {}, raising=True)
    return types.SimpleNamespace(w2v=w2v_mod, hubert=hubert_mod)


def _frontend(engine):
    module, _variables = engine.kw["frontend"]
    return module


@pytest.mark.smoke
def test_pcm_frontend_defaults_to_bf16(patched):
    eng = serve_cli.build_engine(None, "unused", raw=True, pcm=True)
    mod = _frontend(eng)
    assert isinstance(mod, patched.w2v.Wav2Vec2Encoder)
    assert mod.dtype == jnp.bfloat16


@pytest.mark.smoke
def test_w2v_f32_opts_out(patched):
    eng = serve_cli.build_engine(None, "unused", raw=True, pcm=True,
                                 w2v_f32=True)
    assert _frontend(eng).dtype is None


@pytest.mark.smoke
def test_hubert_arch_gets_same_dtype_policy(patched):
    eng = serve_cli.build_engine(None, "unused", raw=True, pcm=True,
                                 w2v_arch="hubert")
    mod = _frontend(eng)
    # HubertEncoder is a Wav2Vec2Encoder factory (hubert.py:32-34)
    assert isinstance(mod, patched.w2v.Wav2Vec2Encoder)
    assert mod.dim == 1024 and mod.layers == 24
    assert mod.dtype == jnp.bfloat16


@pytest.mark.smoke
@pytest.mark.parametrize("flag,expect", [([], False), (["--w2v_f32"], True)])
def test_cli_threads_w2v_f32_flag(monkeypatch, tmp_path, flag, expect):
    # behavioral (not source-text) check that the argparse opt-out reaches
    # build_engine: run main() end-to-end with the engine/server stubbed
    # out and capture the kwarg (ADVICE r4).
    import probtalk_tpu.serve.server as server_mod

    seen = {}

    def fake_build_engine(config, norm_stats, **kw):
        seen.update(kw)
        return types.SimpleNamespace(window=180, max_batch=kw["max_batch"])

    class _Server:
        port = 0

        def __init__(self, engine, **kw):
            pass

        def start(self):
            return self

        def stop(self):
            pass

    def _no_sleep(_secs):
        raise KeyboardInterrupt  # break main()'s serve-forever loop

    monkeypatch.setattr(serve_cli, "build_engine", fake_build_engine)
    monkeypatch.setattr(server_mod, "MotionServer", _Server)
    monkeypatch.setattr("time.sleep", _no_sleep)
    cfg = tmp_path / "c.json"
    cfg.write_text("{}")
    serve_cli.main(["--config_file", str(cfg)] + flag)
    assert seen["w2v_f32"] is expect


@pytest.mark.smoke
def test_build_engine_threads_resident(patched):
    eng = serve_cli.build_engine(None, "unused", raw=True, resident=True,
                                 resident_slots=32)
    assert eng.kw["resident"] is True and eng.kw["resident_slots"] == 32
    # library-level default stays off: the host-carried path is the
    # conservative (mesh-capable, unbounded-session) one
    eng = serve_cli.build_engine(None, "unused", raw=True)
    assert eng.kw["resident"] is False


@pytest.mark.smoke
@pytest.mark.parametrize("flag,expect", [([], True), (["--no-resident"],
                                                      False)])
def test_cli_resident_default_on(monkeypatch, tmp_path, flag, expect):
    # production CLI defaults to the measured-best arm (SERVE_SWEEP.json
    # all_bf16_resident); --no-resident restores the host-carried path
    import probtalk_tpu.serve.server as server_mod

    seen = {}

    def fake_build_engine(config, norm_stats, **kw):
        seen.update(kw)
        return types.SimpleNamespace(window=180, max_batch=kw["max_batch"])

    class _Server:
        port = 0

        def __init__(self, engine, **kw):
            pass

        def start(self):
            return self

        def stop(self):
            pass

    def _no_sleep(_secs):
        raise KeyboardInterrupt

    monkeypatch.setattr(serve_cli, "build_engine", fake_build_engine)
    monkeypatch.setattr(server_mod, "MotionServer", _Server)
    monkeypatch.setattr("time.sleep", _no_sleep)
    cfg = tmp_path / "c.json"
    cfg.write_text("{}")
    serve_cli.main(["--config_file", str(cfg)] + flag)
    assert seen["resident"] is expect
    assert seen["resident_slots"] == 256
