"""Body-branch evaluation: MAD / MAJE / diversity over body+hand channels.

Capability of the reference's ``scripts/test_body.py`` (the body metrics of
test_holisticbody.py:116-139): generate B samples per clip, compare joint
(or channel) trajectories to GT, report MAD/MAJE and variance-normalized
diversity.
"""

from __future__ import annotations

import numpy as np

# GT variance normalizers (data fixtures, test_holisticbody.py:33-36)
BODY_TVAR = 0.98894238471985
BODY_TSUM = 1.60230898857117


def body_metrics(pred, gt):
    """pred: (B, T, C) body+hand channels; gt: (T, C)."""
    t = min(pred.shape[1], gt.shape[0])
    pred, gt = np.asarray(pred)[:, :t], np.asarray(gt)[:t]
    maje = float(np.abs(pred - gt[None]).mean())
    acc_p = np.diff(pred, n=2, axis=1)
    acc_g = np.diff(gt, n=2, axis=0)
    mad = float(np.abs(acc_p - acc_g[None]).mean())
    if pred.shape[0] > 1:
        div = np.mean([
            np.mean(np.abs(pred[i] - pred[j]))
            for i in range(pred.shape[0]) for j in range(i + 1, pred.shape[0])
        ])
    else:
        div = 0.0
    return {"mad": mad, "maje": maje,
            "body_diversity_norm": float(div) / BODY_TSUM}


def run_body_eval(pipe, clips, mean, std, B: int = 4, seed: int = 0):
    """Generate with the holistic pipeline; score the body+hand channels."""
    import jax
    import jax.numpy as jnp
    from probtalk_tpu.core import body_parts

    jaw_d = body_parts.each_dim(True)[0]
    exp_d = body_parts.each_dim(True)[3]
    cidx = body_parts.c_index(True)
    key = jax.random.key(seed)
    results = []
    for clip in clips:
        key, k = jax.random.split(key)
        out = pipe.generate(k, jnp.asarray(clip.aud_feat),
                            jnp.full((B,), clip.speaker, jnp.int32), B=B)
        body_pred = np.asarray(out)[..., jaw_d:-exp_d]
        full = np.concatenate([clip.poses, clip.expression], -1)
        full = (full - mean) / std
        body_gt = full[:, :330][:, cidx]
        results.append(body_metrics(body_pred, body_gt))
    return {k: float(np.mean([r[k] for r in results])) for k in results[0]}


def main(argv=None):
    raise SystemExit("use run_body_eval() with trained stages; see "
                     "scripts/train_demo_campaign.py for stage wiring")


if __name__ == "__main__":
    main()
