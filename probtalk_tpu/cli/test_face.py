"""Face-branch evaluation: L2 / LVD / diversity of jaw+expression.

Capability of the reference's ``scripts/test_face.py`` (face-only metrics
of test_holisticbody's face_loss_diverse at test_holisticbody.py:98-110):
run the face generator (or the face channels of the holistic pipeline) on
held-out clips, report expression L2, velocity difference, and diversity
against the GT variance normalizers.
"""

from __future__ import annotations

import numpy as np

# GT variance normalizers (data fixtures, test_holisticbody.py:33-36)
FACE_TVAR = 7.0697901537642e-4
FACE_TSUM = 1.09510007314384e-3


def face_metrics(pred, gt):
    """pred: (B, T, 106) jaw+expr samples; gt: (T, 106).
    -> dict(face_l2, face_lvd, face_diversity_norm)."""
    t = min(pred.shape[1], gt.shape[0])
    pred, gt = np.asarray(pred)[:, :t], np.asarray(gt)[:t]
    l2 = float(np.sqrt(((pred - gt[None]) ** 2).sum(-1)).mean())
    v_pr = np.diff(pred, axis=1)
    v_gt = np.diff(gt, axis=0)
    lvd = float(np.abs(v_pr - v_gt[None]).mean())
    if pred.shape[0] > 1:
        div = np.mean([
            np.mean(np.abs(pred[i] - pred[j]))
            for i in range(pred.shape[0]) for j in range(i + 1, pred.shape[0])
        ])
    else:
        div = 0.0
    return {"face_l2": l2, "face_lvd": lvd,
            "face_diversity_norm": float(div) / FACE_TSUM}


def run_face_eval(face_model, face_variables, clips, mean, std, B: int = 4,
                  seed: int = 0):
    """Evaluate a FaceGenerator over clips with wav2vec/MFCC features."""
    import jax
    import jax.numpy as jnp
    from probtalk_tpu.core import body_parts

    jaw_d = body_parts.each_dim(True)[0]
    results = []
    for clip in clips:
        aud = jnp.asarray(clip.aud_feat)[None].repeat(B, 0)
        spk = jnp.full((B,), clip.speaker, jnp.int32)
        pred = face_model.apply(face_variables, aud, spk, train=False)
        full = np.concatenate([clip.poses, clip.expression], -1)
        full = (full - mean) / std
        gt = np.concatenate([full[:, :jaw_d], full[:, 330:]], -1)
        results.append(face_metrics(np.asarray(pred), gt))
    return {k: float(np.mean([r[k] for r in results])) for k in results[0]}


def main(argv=None):
    raise SystemExit("use run_face_eval() with a trained FaceGenerator; "
                     "see scripts/train_demo_campaign.py for stage wiring")


if __name__ == "__main__":
    main()
