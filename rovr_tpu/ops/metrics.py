"""Quality + evaluation metrics: PSNR, SSIM, optical-flow preservation.

The preservation metric O = 1 - |computed - org| / org is the poster's
optical-reconstruction metric (parity: reference rovr/test.py:43-57); the
spatio reward shaping matches rovr/rovr.py:234. PSNR/SSIM are the parity
yardsticks named in BASELINE.json.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(x: jnp.ndarray, y: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio over trailing (H, W, C) axes."""
    mse = jnp.mean((x - y) ** 2, axis=(-3, -2, -1))
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Gaussian-windowed SSIM for NHWC images, mean over space/channels."""
    r = filter_size // 2
    coords = jnp.arange(-r, r + 1, dtype=jnp.float32)
    g = jnp.exp(-(coords**2) / (2 * sigma**2))
    g = g / jnp.sum(g)

    def blur(img):
        # separable gaussian via depthwise 1-D convs on H then W
        c = img.shape[-1]
        kh = jnp.tile(g.reshape(filter_size, 1, 1, 1), (1, 1, 1, c))
        kw = jnp.tile(g.reshape(1, filter_size, 1, 1), (1, 1, 1, c))
        dn = jax.lax.conv_dimension_numbers(img.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            img, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
        )
        return jax.lax.conv_general_dilated(
            out, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
        )

    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    # accept any leading batch axes: (..., H, W, C) -> (N, H, W, C)
    lead = x.shape[:-3]
    x = x.reshape((-1,) + x.shape[-3:])
    y = y.reshape((-1,) + y.shape[-3:])
    mu_x, mu_y = blur(x), blur(y)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sx = blur(x * x) - mu_x2
    sy = blur(y * y) - mu_y2
    sxy = blur(x * y) - mu_xy
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    s = ((2 * mu_xy + c1) * (2 * sxy + c2)) / ((mu_x2 + mu_y2 + c1) * (sx + sy + c2))
    return jnp.mean(s, axis=(-3, -2, -1)).reshape(lead)


def preservation(org_values: jnp.ndarray, computed_values: jnp.ndarray) -> jnp.ndarray:
    """1 - |computed - org| / org, org guarded against 0 (test.py:43-57)."""
    org = jnp.where(org_values == 0, jnp.finfo(jnp.float32).eps, org_values)
    return 1.0 - jnp.abs(computed_values - org) / org


def flow_recovery(
    recon_flow: jnp.ndarray, org_flow: jnp.ndarray, corrupted_flow: jnp.ndarray
) -> jnp.ndarray:
    """O = (phi(corrupted) - phi(recon)) relative recovery toward phi(org).

    Matches the poster's headline metric form; equals 1 when the
    reconstruction restores the original's flow magnitude exactly.
    """
    return 1.0 - jnp.abs(recon_flow - org_flow) / jnp.abs(corrupted_flow - org_flow)


def spatio_reward(
    recon_flow, org_flow, corrupted_flow, scale: float = 7.5
) -> jnp.ndarray:
    """(1 - |flow-org| / |corrupted-org|) * scale (rovr.py:234)."""
    return flow_recovery(recon_flow, org_flow, corrupted_flow) * scale


def flow_magnitudes(flows: jnp.ndarray) -> jnp.ndarray:
    """Per-pair scalar magnitude sqrt(sum flow^2) (rovr.py:362).

    flows: (P, H, W, 2) -> (P,).
    """
    return jnp.sqrt(jnp.sum(flows.astype(jnp.float32) ** 2, axis=(-3, -2, -1)))


def context_exposure(hole, tgt_idx, pairs):
    """Exposure rate of chosen context pairs: the fraction of the targets'
    hole pixels visible in >= 1 chosen context frame.

    Only an exposing context can supply a hole's content (the premise of the
    explicit teacher scheme, video_ds_explicit.py:114-191), so this is the
    direct readout of context-selection quality; teacher pairs score 1.0
    under overlap-free mask geometry. Computed from pixel masks — no teacher
    tables needed, works for any dataset.

    hole: (B, S, H, W, 1), 1 where corruption removed content.
    tgt_idx: (T, B) target frame per step; pairs: (T, B, 2) chosen contexts.
    """
    import jax

    def one(tgt_t, pair_t):
        ht = jax.vmap(lambda h, i: h[i])(hole, tgt_t)
        ha = jax.vmap(lambda h, i: h[i])(hole, pair_t[:, 0])
        hb = jax.vmap(lambda h, i: h[i])(hole, pair_t[:, 1])
        return jnp.sum(ht * (1.0 - ha * hb)), jnp.sum(ht)

    num, den = jax.vmap(one)(tgt_idx, pairs)
    return jnp.sum(num) / jnp.maximum(jnp.sum(den), 1.0)


def context_exposure_per_clip(hole, tgt_idx, pairs):
    """`context_exposure` resolved per clip: (B,) exposure rates, hole-pixel
    weighted over the clip's own steps only. The batch-pooled scalar above is
    exactly the den-weighted mean of these, kept separate so existing
    callers' numbers are untouched; the per-clip form is what the
    variance-proofed held-out evaluation's confidence intervals need
    (train/evaluate.run_ci, VERDICT r4 #1)."""
    import jax

    def one(tgt_t, pair_t):
        ht = jax.vmap(lambda h, i: h[i])(hole, tgt_t)
        ha = jax.vmap(lambda h, i: h[i])(hole, pair_t[:, 0])
        hb = jax.vmap(lambda h, i: h[i])(hole, pair_t[:, 1])
        # per-clip pixel sums: reduce space only, keep the batch axis
        return (
            jnp.sum(ht * (1.0 - ha * hb), axis=(1, 2, 3)),
            jnp.sum(ht, axis=(1, 2, 3)),
        )

    num, den = jax.vmap(one)(tgt_idx, pairs)  # (T, B) each
    return jnp.sum(num, axis=0) / jnp.maximum(jnp.sum(den, axis=0), 1.0)
