"""Diagnostic: how much does context CHOICE matter to the inpainting UNet?

The agentic-vs-sequential claim (poster "Global Network Results",
reference loop rovr/rovr.py:164-175) only holds if reconstruction quality
actually depends on which context frames the policy picks. This probe
pretrains the UNet exactly as the pipeline does, then reconstructs held-out
clips under forced context schemes:

  teacher    — a positive pair from the explicit solution table
               (video_ds_explicit.py:133-164): exposes every masked region
  sequential — (t-2, t-1) mod S, the vid2vid baseline (rovr.py:166-175)
  random     — a uniformly random pair
  same_group — a negative (useless) pair from the teacher table

and reports masked-region PSNR + the pair's hole-exposure rate per scheme.
The teacher-vs-random gap is the reward signal PPO must exploit; the
sequential-vs-random gap isolates the temporal-adjacency advantage (moving
scene content favors neighbors independently of exposure).

Usage: python benchmarks/context_sensitivity.py [texture] [texture_vel] \
           [pretrain_steps] [overlap_free 0|1]
Writes results/context_sensitivity_t{texture}_v{vel}[_of].json
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rovr_tpu.data.device_synthetic import DeviceSyntheticExplicit
from rovr_tpu.train import pipeline, pretrain_local
from rovr_tpu.utils.compilation_cache import enable as enable_compile_cache


def masked_psnr(recon, org, hole):
    """recon/org (B,S,H,W,3), hole (B,S,H,W,1) 1=corrupted-away."""
    se = jnp.sum((recon - org) ** 2 * hole, axis=(2, 3, 4))
    mse = se / jnp.maximum(jnp.sum(hole, axis=(2, 3, 4)), 1.0)
    return jnp.mean(-10.0 * jnp.log10(jnp.maximum(mse, 1e-10)))


def exposure_rate(pairs, hole):
    """pairs (B,S,2) context indices per target; hole (B,S,H,W,1).
    Fraction of each target's hole pixels visible in >= 1 chosen context."""
    b, s = pairs.shape[:2]
    ha = jax.vmap(lambda h, i: h[i])(hole, pairs[..., 0])  # (B,S,H,W,1)
    hb = jax.vmap(lambda h, i: h[i])(hole, pairs[..., 1])
    tgt = hole
    both = ha * hb
    return float(jnp.sum(tgt * (1.0 - both)) / jnp.maximum(jnp.sum(tgt), 1.0))


def reconstruct_with(params, mods, video, pairs):
    """Inpaint every frame of (B,S,H,W,3) using per-frame context `pairs`
    (B,S,2), all gathered from the immutable corrupted video (parity with
    rovr.py:133,152-153). Returns (B,S,H,W,3)."""
    b, s = video.shape[:2]
    tgt = video.reshape((b * s,) + video.shape[2:])
    ctx = jax.vmap(lambda v, p: v[p])(video, pairs.reshape(b, s * 2))
    ctx = ctx.reshape((b * s, 2) + video.shape[2:])
    y = mods.local_net.apply({"params": params}, tgt, ctx)
    return y.reshape(video.shape).astype(jnp.float32)


def main():
    texture = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    vel = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1500
    overlap_free = bool(int(sys.argv[4])) if len(sys.argv) > 4 else False
    enable_compile_cache()
    cfg = pipeline.default_config()
    h, w = cfg.data.frame_size
    s = cfg.rl.vid_length

    # --- pretrain exactly as pipeline stage 1
    src = DeviceSyntheticExplicit(4, h, w, seed=cfg.run.seed + 77,
                                  texture=texture, texture_vel=vel,
                                  overlap_free=overlap_free)
    vids, origs, poss = [], [], []
    for i in range(8):
        corrupted, original, _, positives, _ = src.next(i)
        vids.append(corrupted[:, :s])
        origs.append(original[:, :s])
        poss.append(jnp.asarray(positives[:, :s], jnp.int32))
    data = (jnp.concatenate(vids), jnp.concatenate(origs), jnp.concatenate(poss))
    t0 = time.time()
    curve = []
    state = pretrain_local.run(
        cfg, data=data, steps=steps,
        log_cb=lambda i, m: curve.append(
            {"step": int(i), **{k: float(v) for k, v in m.items()}}),
    )
    print(f"pretrain {steps} steps in {time.time()-t0:.0f}s "
          f"(total {curve[0]['Loss/total_loss']:.4f} -> "
          f"{curve[-1]['Loss/total_loss']:.4f})", flush=True)

    mods = pretrain_local.make_modules(cfg)
    jit_recon = jax.jit(lambda p, v, prs: reconstruct_with(p, mods, v, prs))

    # --- held-out clips, forced context schemes
    rng = np.random.default_rng(123)
    ev = DeviceSyntheticExplicit(4, h, w, seed=cfg.run.seed + 10_000,
                                 texture=texture, texture_vel=vel,
                                 overlap_free=overlap_free)
    out = {"texture": texture, "texture_vel": vel, "pretrain_steps": steps,
           "overlap_free": overlap_free,
           "pretrain_first": curve[0], "pretrain_last": curve[-1]}
    agg = {}
    n_batches = 5
    for i in range(n_batches):
        corrupted, original, masks, positives, negatives = ev.next(i)
        corrupted, original = corrupted[:, :s], original[:, :s]
        hole = 1.0 - masks[:, :s, :, :, :1]
        b = corrupted.shape[0]
        schemes = {}
        pick = rng.integers(0, positives.shape[2], (b, s))
        schemes["teacher"] = jnp.asarray(
            np.take_along_axis(positives[:, :s], pick[..., None, None], 2
                               )[:, :, 0], jnp.int32)
        t_idx = np.arange(s)
        seq = np.stack([(t_idx - 2) % s, (t_idx - 1) % s], -1)
        schemes["sequential"] = jnp.asarray(
            np.broadcast_to(seq, (b, s, 2)).copy(), jnp.int32)
        rnd = rng.integers(0, s, (b, s, 2))
        schemes["random"] = jnp.asarray(rnd, jnp.int32)
        pickn = rng.integers(0, negatives.shape[2], (b, s))
        schemes["same_group"] = jnp.asarray(
            np.take_along_axis(negatives[:, :s], pickn[..., None, None], 2
                               )[:, :, 0], jnp.int32)
        for name, pairs in schemes.items():
            recon = jit_recon(state.params, corrupted, pairs)
            # fill only the holes: composite recon into the corrupted frame
            composite = corrupted * masks[:, :s] + recon * (1 - masks[:, :s])
            agg.setdefault(name, {"psnr": [], "psnr_composite": [], "exposure": []})
            agg[name]["psnr"].append(float(masked_psnr(recon, original, hole)))
            agg[name]["psnr_composite"].append(
                float(masked_psnr(composite, original, hole)))
            agg[name]["exposure"].append(exposure_rate(pairs, hole))
    for name, d in agg.items():
        out[name] = {k: float(np.mean(v)) for k, v in d.items()}
        print(f"{name:11s} masked_psnr {out[name]['psnr']:7.3f}  "
              f"exposure {out[name]['exposure']:.3f}", flush=True)

    os.makedirs("results", exist_ok=True)
    path = (f"results/context_sensitivity_t{texture}_v{vel}"
            f"{'_of' if overlap_free else ''}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"written {path}")


if __name__ == "__main__":
    main()
