"""Structural ceilings for the reference's context-policy class.

The reference's context policy — and this rebuild's parity policies — pick
the TOP-2 of one per-frame softmax (policy_net_2.py:94-102): a factorized
("marginal") pair distribution. This diagnostic computes, from mask
geometry alone (no pixels, no models), what such a policy can possibly
achieve on each synthetic corruption scheme, in hole-EXPOSURE terms (the
fraction of the target's corrupted pixels visible in >= 1 chosen context —
an exposing context is a necessary condition for the inpainting UNet to
recover content, ops/metrics.context_exposure).

Schemes:
  explicit — the teacher group-mask scheme (video_ds_explicit.py:114-191,
             data/teacher.py). Full exposure requires JOINT pair coverage:
             groups are built so no single frame exposes a target's four
             mask locations. The best possible MARGINAL policy (rank frames
             by individual coverage, take top-2) lands near random, because
             the two individually-best frames usually cover the same cells.
  raster   — the standard deterministic box tracking frame index
             (video_ds.py:62-87, corruption.raster_box). Adjacent frames'
             boxes overlap heavily, so sequential (t-1, t-2) contexts are
             poor while any far frame exposes the whole hole — a per-frame
             criterion a marginal policy CAN represent; the frame size sets
             how hard random pairs are (box size is fixed at 150x100).

Policies compared per target: sequential (t-2, t-1), random pair, teacher
canonical pair (explicit only), cov_top2 = top-2 frames by individual
coverage (the marginal optimum), best_pair = exhaustive joint-best pair
(needs a non-factorized policy).

Usage: python benchmarks/policy_ceiling.py
Writes results/policy_ceiling.json. Representative output (S=20):

  explicit:       seq=0.67 random=0.67 cov_top2=0.75 teacher/best=1.00
  raster @256px:  seq=0.47 random=0.95 cov_top2=1.00 best=1.00
  raster @160px:  seq=0.30 random=0.79 cov_top2=0.97 best=0.99

Conclusions wired into the framework: RL + eval use the raster scheme
(DataConfig.synthetic_scheme) at frame=160 (train/pipeline.default_config);
imitation keeps the explicit scheme (it needs the teacher tables) with the
0.75 marginal cap documented (ImitationConfig.loss_mode).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rovr_tpu.data import teacher
from rovr_tpu.data.corruption import raster_box_masks_jax

S = teacher.NUM_FRAMES


def _stats(hole, pos=None, trials_rng=None):
    """hole: (S, H, W) or (S, L) binary 'corrupted-away' indicator rows."""
    intact = 1.0 - hole
    rng = trials_rng or np.random.default_rng(0)

    def exposure(t, i, j):
        h = hole[t]
        return float((h * (1 - (1 - intact[i]) * (1 - intact[j]))).sum()
                     / max(h.sum(), 1))

    out = {k: [] for k in ("sequential", "random", "cov_top2", "best_pair")}
    if pos is not None:
        out["teacher"] = []
    for t in range(S):
        out["sequential"].append(exposure(t, (t - 2) % S, (t - 1) % S))
        cand = [i for i in range(S) if i != t]
        out["random"].append(exposure(t, *rng.choice(cand, 2, replace=False)))
        cov = np.array([
            (hole[t] * intact[i]).sum() / max(hole[t].sum(), 1)
            if i != t else -1.0
            for i in range(S)
        ])
        top2 = np.argsort(-cov, kind="stable")[:2]
        out["cov_top2"].append(exposure(t, *top2))
        out["best_pair"].append(
            max(exposure(t, i, j) for i in cand for j in cand if i < j)
        )
        if pos is not None:
            out["teacher"].append(exposure(t, *pos[t, 0]))
    return out


def explicit_ceiling(trials: int = 200):
    agg = None
    for trial in range(trials):
        a = teacher.sample_assignment(np.random.default_rng((1, trial)))
        hole = np.zeros((S, S))
        for i in range(S):
            hole[i, np.asarray(a.frame_masks)[i]] = 1.0
        st = _stats(hole, pos=np.asarray(a.positives))
        agg = st if agg is None else {
            k: agg[k] + st[k] for k in st
        }
    return {k: float(np.mean(v)) for k, v in agg.items()}


def raster_ceiling(hw: int):
    masks = np.asarray(raster_box_masks_jax(2 * np.arange(S), hw, hw))[..., 0]
    hole = (1.0 - masks).reshape(S, -1)
    return {k: float(np.mean(v)) for k, v in _stats(hole).items()}


if __name__ == "__main__":
    result = {"explicit": explicit_ceiling()}
    for hw in (256, 224, 192, 160, 128):
        result[f"raster_{hw}"] = raster_ceiling(hw)
    for k, v in result.items():
        print(k, json.dumps({m: round(x, 3) for m, x in v.items()}))
    os.makedirs("results", exist_ok=True)
    with open("results/policy_ceiling.json", "w") as f:
        json.dump(result, f, indent=1)
