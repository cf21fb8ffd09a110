"""Pipeline parallelism: GPipe schedule == sequential layer application.

Covers ``parallel/pipeline.py`` on the 8-device virtual CPU mesh: the
microbatched ppermute schedule must be a pure reordering of compute —
bitwise-level agreement with running the layer stack sequentially.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probtalk_tpu.parallel import make_mesh
from probtalk_tpu.parallel.pipeline import (
    make_pipelined_refine_layers,
    pipeline_apply,
    shard_stage_params,
    stack_stage_params,
)


def toy_layer(p, stream):
    x, cond = stream
    return (jnp.tanh(x @ p["w"] + p["b"]) + cond, cond)


class TestPipelineApply:
    @pytest.mark.parametrize("stages,micro", [(2, 2), (2, 4), (4, 4), (4, 8)])
    def test_matches_sequential(self, rng, stages, micro):
        dim, batch, t = 16, 8, 6
        layers = [{"w": jnp.asarray(rng.normal(size=(dim, dim)) * 0.3,
                                    jnp.float32),
                   "b": jnp.asarray(rng.normal(size=(dim,)), jnp.float32)}
                  for _ in range(4)]
        x = jnp.asarray(rng.normal(size=(batch, t, dim)), jnp.float32)
        cond = jnp.asarray(rng.normal(size=(batch, t, dim)) * 0.1,
                           jnp.float32)

        seq = (x, cond)
        for p in layers:
            seq = toy_layer(p, seq)

        mesh = make_mesh(data=8 // stages, model=stages)
        stacked = shard_stage_params(stack_stage_params(layers, stages),
                                     mesh, "model")
        out, _ = pipeline_apply(toy_layer, stacked, (x, cond), mesh,
                                axis="model", microbatches=micro)
        np.testing.assert_allclose(np.asarray(out), np.asarray(seq[0]),
                                   atol=1e-6)

    def test_jit_compiles_once(self, rng):
        """The whole schedule must live inside one jitted XLA program."""
        dim = 8
        layers = [{"w": jnp.eye(dim), "b": jnp.zeros(dim)} for _ in range(2)]
        mesh = make_mesh(data=4, model=2)
        stacked = shard_stage_params(stack_stage_params(layers, 2),
                                     mesh, "model")
        x = jnp.asarray(rng.normal(size=(4, 3, dim)), jnp.float32)

        @jax.jit
        def run(sp, x):
            out, _ = pipeline_apply(toy_layer, sp, (x, jnp.zeros_like(x)),
                                    mesh, axis="model")
            return out

        out = run(stacked, x)
        np.testing.assert_allclose(np.asarray(out),
                                   np.tanh(np.tanh(np.asarray(x))),
                                   atol=1e-6)


class TestRTransformerPipeline:
    def test_styled_layer_stack(self, rng):
        """Real StyledDecoderLayer stack pipelined over 4 stages == the
        sequential stack with identical params."""
        from probtalk_tpu.models.ptransformer import StyledDecoderLayer

        dim, heads, batch, t = 32, 4, 8, 10
        layer = StyledDecoderLayer(dim, heads, styled=True, dropout=0.0)
        h = jnp.asarray(rng.normal(size=(batch, t, dim)), jnp.float32)
        cond = jnp.asarray(rng.normal(size=(batch, t, dim)), jnp.float32)
        lab = jnp.asarray(rng.normal(size=(batch, dim)), jnp.float32)

        params = []
        for i in range(4):
            v = layer.init(jax.random.key(i), h, cond, lab)
            params.append(v["params"])

        seq = h
        for p in params:
            seq = layer.apply({"params": p}, seq, cond, lab, train=False)

        mesh = make_mesh(data=2, model=4)
        model = type("M", (), {"layers": 4, "dim": dim, "heads": heads,
                               "use_label": True})()
        fn = make_pipelined_refine_layers(
            model, {f"layer_{i}": p for i, p in enumerate(params)}, mesh)
        out = fn(h, cond, lab)
        np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                                   rtol=2e-5, atol=2e-5)


class TestPipelineGradients:
    def test_grad_matches_sequential(self, rng):
        """GPipe is training-capable: gradients through the ppermute
        schedule == gradients of the sequential stack."""
        dim, batch, t = 8, 8, 4
        layers = [{"w": jnp.asarray(rng.normal(size=(dim, dim)) * 0.4,
                                    jnp.float32),
                   "b": jnp.zeros((dim,), jnp.float32)} for _ in range(4)]
        x = jnp.asarray(rng.normal(size=(batch, t, dim)), jnp.float32)
        cond = jnp.zeros_like(x)
        mesh = make_mesh(data=2, model=4)

        def seq_loss(ls):
            s = (x, cond)
            for p in ls:
                s = toy_layer(p, s)
            return (s[0] ** 2).mean()

        def pipe_loss(stacked):
            out, _ = pipeline_apply(toy_layer, stacked, (x, cond), mesh,
                                    axis="model", microbatches=4)
            return (out ** 2).mean()

        g_seq = jax.grad(seq_loss)(layers)
        stacked = shard_stage_params(stack_stage_params(layers, 4),
                                     mesh, "model")
        g_pipe = jax.grad(pipe_loss)(stacked)
        # unstack (4 stages x 1 layer each) back to the per-layer list
        for i in range(4):
            np.testing.assert_allclose(
                np.asarray(g_pipe["w"][i, 0]), np.asarray(g_seq[i]["w"]),
                atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(g_pipe["b"][i, 0]), np.asarray(g_seq[i]["b"]),
                atol=1e-5)
