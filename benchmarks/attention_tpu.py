"""TPU microbench: the Pallas flash kernel at the FLAGSHIP attention shape.

VERDICT r1 item 3 asked for proof that the shipped config-5 attention path
is real: `config_rl_scaled()` gives the attention context policy
hidden_dim=256 / heads=4 (head_dim 64) over 64 frames x 4 patch tokens
= L 256, and `ops.pallas.attention.supported()` must admit that shape on
TPU (it rejects only sub-(128x128) products where one fused XLA softmax
matmul is already optimal).

Run on the real chip (`python benchmarks/attention_tpu.py`). For each shape
it asserts:
  * supported() is True (the kernel ENGAGES via models/attention._attend),
  * flash forward matches the jnp reference (fp32 tolerance),
  * fused backward matches jnp grads,
and reports wall time per call for flash vs jnp, fwd and fwd+bwd.
Prints one JSON line per shape; paste-ready for docs/performance.md.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rovr_tpu.config import config_rl_scaled
from rovr_tpu.ops.pallas.attention import flash_attention, supported


def _jnp_attention(q, k, v):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(q.shape[-1] * 1.0)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)


def _time(fn, *args, iters: int = 200) -> float:
    from rovr_tpu.utils.transfer import tunnel_sync

    out = fn(*args)
    tunnel_sync(out)  # warm up / compile / drain
    # round-trip floor: fetching from an ALREADY-computed buffer measures
    # only the sync itself, no execution
    t0 = time.perf_counter()
    tunnel_sync(out)
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    tunnel_sync(out)
    return max(0.0, (time.perf_counter() - t0 - overhead)) / iters


def bench_shape(b: int, h: int, l: int, d: int) -> dict:
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, l, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, l, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, l, d), jnp.float32)
    dout = jax.random.normal(kg, (b, h, l, d), jnp.float32)

    on_tpu = jax.devices()[0].platform == "tpu"
    engaged = supported(q.shape, k.shape)
    assert engaged == on_tpu, (
        f"flash kernel must engage at ({b},{h},{l},{d}) on TPU; "
        f"supported()={engaged}, platform={jax.devices()[0].platform}"
    )

    # off-TPU (smoke runs) the kernel executes in the Pallas interpreter
    flash_impl = functools.partial(flash_attention, interpret=not on_tpu)
    flash = jax.jit(flash_impl)
    ref = jax.jit(_jnp_attention)
    out_f, out_r = flash(q, k, v), ref(q, k, v)
    fwd_err = float(jnp.max(jnp.abs(out_f - out_r)))

    def loss_f(fn):
        return jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v) * dout), argnums=(0, 1, 2)
        ))

    g_f, g_r = loss_f(flash_impl), loss_f(_jnp_attention)
    errs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_f(q, k, v), g_r(q, k, v))]

    rec = {
        "shape_bhld": [b, h, l, d],
        "engaged": engaged,
        "fwd_max_abs_err": fwd_err,
        "bwd_max_abs_err": max(errs),
        "flash_fwd_us": round(_time(flash, q, k, v) * 1e6, 1),
        "jnp_fwd_us": round(_time(ref, q, k, v) * 1e6, 1),
        "flash_fwdbwd_us": round(_time(g_f, q, k, v) * 1e6, 1),
        "jnp_fwdbwd_us": round(_time(g_r, q, k, v) * 1e6, 1),
    }
    assert fwd_err < 2e-2 and max(errs) < 5e-2, rec
    return rec


def main() -> None:
    cfg = config_rl_scaled()
    m = cfg.model
    d = m.attn_hidden_dim // m.attn_heads
    l = cfg.rl.vid_length * m.attn_patch_tokens
    shapes = [
        (cfg.rl.batch_size, m.attn_heads, l, d),       # flagship config 5
        (cfg.rl.batch_size, m.attn_heads, 4 * l, d),   # 16 patch tokens/frame
        (1, m.attn_heads, 16 * l, d),                  # single long clip
    ]
    for s in shapes:
        print(json.dumps(bench_shape(*s)))


if __name__ == "__main__":
    main()
