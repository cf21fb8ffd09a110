"""Tensor-parallel parameter sharding over the mesh 'model' axis.

The reference has no TP (single-GPU, §2.3); this is the TPU-native
scaling layer for larger variants: Megatron-style column/row splits of
the transformer matmuls expressed purely as ``NamedSharding`` placements
— XLA's SPMD partitioner propagates the shardings through the jitted
step and inserts the ICI collectives (all-reduce after row-parallel
matmuls) automatically. No model code changes; any step function works
unmodified on TP-sharded params.

Rules cover the PTransformer/RTransformer decoder layers (attention
head-dim splits + FFN column/row split), the Wav2Vec2 encoder (same
layer names), and the PQ codebooks (sharded over groups).
"""

from __future__ import annotations

import re
from typing import List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, axis to shard over 'model'). First match wins.
TP_RULES: List[Tuple[str, int]] = [
    # attention: split heads (kernel (in, H, Dh) / out (H, Dh, in))
    (r".*attn/(query|key|value)/kernel$", 1),
    (r".*attn/(query|key|value)/bias$", 0),
    (r".*attn/out/kernel$", 0),
    # FFN: column-parallel in, row-parallel out
    (r".*(linear1|fc1)/kernel$", 1),
    (r".*(linear1|fc1)/bias$", 0),
    (r".*(linear2|fc2)/kernel$", 0),
    # PQ/RQ codebooks: shard the group axis (G, K, D)
    (r".*quant.*codebooks$", 0),
    (r".*quant.*ema_(counts|dw)$", 0),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def tp_spec(path: str, ndim: int, rules=None):
    """-> PartitionSpec for a param path, or replicated."""
    for pat, axis in (rules or TP_RULES):
        if re.match(pat, path) and axis < ndim:
            spec = [None] * ndim
            spec[axis] = "model"
            return P(*spec)
    return P()


def tp_sharding_tree(tree, mesh: Mesh, rules=None):
    """-> pytree of NamedSharding mirroring ``tree`` with TP rules
    applied; everything else replicated. Divisibility: a matched axis
    must divide by the mesh's 'model' size, else that leaf stays
    replicated."""
    msize = mesh.shape["model"]

    def shard_of(path, x):
        spec = tp_spec(_path_str(path), getattr(x, "ndim", 0), rules)
        dims = [d for d in spec if d is not None]
        if dims:
            axis = list(spec).index("model")
            if x.shape[axis] % msize != 0:
                spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(shard_of, tree)


def tp_shard(tree, mesh: Mesh, rules=None):
    """Place a param pytree with TP rules applied, as ONE batched
    ``jax.device_put`` — per-leaf puts issue one blocking transfer (and
    potential reshard compile) each, which wedged the driver's multichip
    dryrun on the 1-core host (MULTICHIP_r03 rc=124)."""
    return jax.device_put(tree, tp_sharding_tree(tree, mesh, rules))


def tp_shard_state(state, mesh: Mesh, rules=None):
    """TrainState convenience: params/opt_state TP-sharded (optimizer
    moments follow their params — their leaf paths embed the param
    paths, so the same rules match), mutables/step replicated. The whole
    state moves in a single batched device_put."""
    rep = NamedSharding(mesh, P())
    shardings = state.replace(
        step=rep,
        params=tp_sharding_tree(state.params, mesh, rules),
        opt_state=tp_sharding_tree(state.opt_state, mesh, rules),
        mutables=jax.tree_util.tree_map(lambda _: rep, state.mutables),
    )
    return jax.device_put(state, shardings)
