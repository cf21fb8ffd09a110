"""Pipeline parallelism: GPipe-style microbatched layer pipelining.

The reference is single-GPU (SURVEY §2.3) and has no pipeline axis; this
is the TPU-native scaling layer for deep variants whose layer stack
exceeds one chip's HBM. Expressed entirely with ``shard_map`` +
``lax.ppermute`` over a mesh axis:

  * the L identical transformer layers are stacked into (S, L/S, ...)
    parameter pytrees, sharded so each device holds one stage's chunk;
  * the batch is split into M microbatches; a ``lax.scan`` over
    M + S - 1 ticks runs the classic GPipe schedule — at tick k device s
    processes microbatch k - s, then ``ppermute``s its activations to
    device s + 1 over ICI;
  * the last stage's emissions are ``psum``-broadcast so every device
    (and the caller) sees the full output.

Everything is a single compiled XLA program: static tick count, static
microbatch shapes, collectives scheduled by the SPMD partitioner.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(layer_params: Sequence, n_stages: int):
    """[L per-layer param trees] -> one tree with leading (S, L/S) axes,
    ready to shard over the pipeline mesh axis."""
    n = len(layer_params)
    assert n % n_stages == 0, (n, n_stages)
    per = n // n_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)
    return jax.tree.map(
        lambda x: x.reshape((n_stages, per) + x.shape[1:]), stacked)


def shard_stage_params(stacked, mesh: Mesh, axis: str = "model"):
    """Place stacked stage params with the leading axis over ``axis``."""

    def put(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    return jax.tree.map(put, stacked)


def pipeline_apply(layer_fn: Callable, stage_params, stream, mesh: Mesh,
                   axis: str = "model", microbatches: Optional[int] = None):
    """Run a layer stack as a pipeline over the mesh ``axis``.

    layer_fn(per_layer_params, stream) -> stream — one layer applied to the
    streamed pytree (activations plus any per-sample conditioning that must
    travel with them, e.g. cross-attention memories).
    stage_params: from ``stack_stage_params`` (leading (S, L/S) axes).
    stream: pytree of (B, ...) arrays; B must divide into ``microbatches``
    (default: one microbatch per stage — the minimum that fills the pipe).

    Output == sequentially applying all L layers (exact, no renorm): the
    schedule only reorders compute across devices.
    """
    s_count = mesh.shape[axis]
    batch = jax.tree.leaves(stream)[0].shape[0]
    m_count = microbatches or s_count
    assert batch % m_count == 0, (batch, m_count)
    mb = batch // m_count
    xs = jax.tree.map(
        lambda a: a.reshape((m_count, mb) + a.shape[1:]), stream)

    # stage params enter sharded over `axis`; the stream is replicated
    # (including over any data axis — every replica runs the same pipe)
    def shard_fn(p, xs):
        p = jax.tree.map(lambda a: a[0], p)       # (1, L/S, ...) -> (L/S, ...)
        idx = jax.lax.axis_index(axis)

        def stage(stream_k):
            out, _ = jax.lax.scan(
                lambda s, lp: (layer_fn(lp, s), None), stream_k, p)
            return out

        zeros = jax.tree.map(lambda a: jnp.zeros_like(a[0]), xs)

        def tick(act, k):
            x_in = jax.tree.map(
                lambda a, b: jnp.where(idx == 0,
                                       a[jnp.clip(k, 0, m_count - 1)], b),
                xs, act)
            out = stage(x_in)
            # zeros_like (not literal 0.0) keeps each leaf's dtype so
            # int/bool stream leaves round-trip the psum unchanged
            emit = jax.lax.psum(
                jax.tree.map(
                    lambda a: jnp.where(idx == s_count - 1, a,
                                        jnp.zeros_like(a)), out), axis)
            nxt = jax.lax.ppermute(
                out, axis, [(i, i + 1) for i in range(s_count - 1)])
            return nxt, emit

        _, emits = jax.lax.scan(tick, zeros, jnp.arange(m_count + s_count - 1))
        # device s==S-1 emitted microbatch k-(S-1) at tick k
        return jax.tree.map(lambda a: a[s_count - 1:], emits)

    out = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_rep=False,
    )(stage_params, xs)
    return jax.tree.map(
        lambda a: a.reshape((batch,) + a.shape[2:]), out)


# ---------------------------------------------------------------------------
# RTransformer integration: pipeline the StyledDecoderLayer stack
# ---------------------------------------------------------------------------

def make_pipelined_refine_layers(model, params, mesh: Mesh,
                                 axis: str = "model",
                                 microbatches: Optional[int] = None):
    """-> fn(h, cond, label_embed) running ``model``'s (RTransformer)
    decoder-layer stack as a pipeline. The surrounding input/output
    projections stay replicated (they are a tiny fraction of the FLOPs);
    only the L identical StyledDecoderLayers are pipelined."""
    from probtalk_tpu.models.ptransformer import StyledDecoderLayer

    layer_params = [params[f"layer_{i}"] for i in range(model.layers)]
    stacked = shard_stage_params(
        stack_stage_params(layer_params, mesh.shape[axis]), mesh, axis)
    layer = StyledDecoderLayer(model.dim, model.heads,
                               styled=model.use_label, dropout=0.0,
                               dtype=getattr(model, "dtype", None))

    def layer_fn(lp, stream):
        h, cond, lab = stream
        h = layer.apply({"params": lp}, h, cond, lab, train=False)
        return (h, cond, lab)

    def fn(h, cond, label_embed):
        out, _, _ = pipeline_apply(layer_fn, stacked, (h, cond, label_embed),
                                   mesh, axis=axis, microbatches=microbatches)
        return out

    return fn
