"""Gradient-level parity vs torch — the backward-path counterpart of
tests/test_torch_parity.py and tests/test_reference_parity.py, which are
forward-only. The reference's training IS autograd: the pretrain MSE+LPIPS
backward (reference: rovr/train_local_net_unet.py:115-116), PolicyNet2's
masked-logits and critic backward, and PPO's actor/critic updates
(rovr/rovr.py:308-334). These tests transplant weights torch -> flax and
assert that a single gradient matches, so any backward-semantics change
(e.g. a pooling lowering rewrite) trips a test instead of landing silently.

Gradient conversion: every convert_torch_state_dict in the repo is a pure
index permutation (transposes, spatial flips, row permutations) — a linear,
value-independent relabeling — so gradients convert through the SAME
function as weights. Tie-breaking: all inputs here are continuous random
draws, so max-pool windows have unique argmaxes with probability 1 and the
documented cotangent-split-vs-single-winner deviation at EXACT ties
(models/layers.py max_pool docstring, pinned by tests/test_layers.py) never
engages.
"""

import sys
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-tier only; fast tier: -m 'not slow'

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))
import torch_baseline as tb  # noqa: E402

from rovr_tpu.models import local_net as ln  # noqa: E402
from rovr_tpu.models import policy_net_2 as p2  # noqa: E402
from rovr_tpu.models import vgg_lpips as vl  # noqa: E402
from rovr_tpu.ops.ppo import critic_loss, ppo_clip_actor_loss  # noqa: E402
from rovr_tpu.ops.rewards import normalized_advantage  # noqa: E402

REF = Path("/root/reference/rovr")
needs_reference = pytest.mark.skipif(not REF.is_dir(), reason="no reference tree")

DT = jnp.float32


def _load_ref(name):
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        fn = types.ModuleType("torchvision.transforms.functional")
        tr.functional = fn
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = fn
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import importlib

    return importlib.import_module(name)


def nhwc(x):
    return x.detach().numpy().transpose(0, 2, 3, 1)


def _grad_state_dict(module) -> dict:
    """Parameter gradients keyed like state_dict(), zeros where untouched."""
    return {
        k: (p.grad if p.grad is not None else torch.zeros_like(p)).detach()
        for k, p in module.named_parameters()
    }


def assert_tree_close(got, want, rtol=2e-3):
    """Per-leaf gradient comparison with an absolute floor scaled to each
    leaf's magnitude (gradient leaves span many orders of magnitude). A
    leaf whose largest entry is below 1e-4 of the tree-wide gradient scale
    is compared against that floor instead: the trunk-conv bias gradients
    are MATHEMATICALLY zero on both sides (BN's mean subtraction cancels
    the bias; layers.py CanvasConv3x3 docstring) but torch autograd leaves
    ~1e-6 roundoff in them while fold_bias_into_norm yields exact zeros."""
    got_f = {"/".join(map(str, p)): np.asarray(v)
             for p, v in jax.tree_util.tree_flatten_with_path(got)[0]}
    want_f = {"/".join(map(str, p)): np.asarray(v)
              for p, v in jax.tree_util.tree_flatten_with_path(want)[0]}
    assert got_f.keys() == want_f.keys()
    global_scale = max(float(np.abs(v).max()) for v in want_f.values())
    for k in want_f:
        if float(np.abs(got_f[k]).max()) == 0.0:
            # jax produced an EXACT zero gradient (an unused param, e.g. a
            # folded conv bias) -> the torch side must agree up to autograd
            # roundoff of its cancelled computation
            assert float(np.abs(want_f[k]).max()) <= 1e-3 * global_scale, (
                f"leaf {k}: jax grad is exactly 0 but torch grad is not"
            )
            continue
        # relative-L2 criterion (robust to fp32 accumulation-order noise on
        # individual tiny entries) + a max-abs backstop vs the leaf scale
        diff = got_f[k].astype(np.float64) - want_f[k].astype(np.float64)
        denom = float(np.linalg.norm(want_f[k].astype(np.float64)))
        rel_l2 = float(np.linalg.norm(diff)) / max(denom, 1e-30)
        scale = max(float(np.abs(want_f[k]).max()), 1e-4 * global_scale)
        max_abs = float(np.abs(diff).max())
        assert rel_l2 <= rtol and max_abs <= 10 * rtol * scale, (
            f"gradient leaf {k}: rel_l2={rel_l2:.2e} (tol {rtol}), "
            f"max_abs={max_abs:.2e} vs scale {scale:.2e}"
        )


class TestLocalNetPretrainGradient:
    def test_mse_lpips_backward_matches_torch(self):
        """d(gamma*MSE + (1-gamma)*LPIPS)/d(unet params) — the pretrain
        backward, train_local_net_unet.py:107-116."""
        torch.manual_seed(0)
        tnet = tb.LocalUNet()
        tlpips = tb.VGGLpips().eval()
        for p_ in tlpips.parameters():
            p_.requires_grad_(False)

        # transplant UNet weights (name remap as in test_torch_parity)
        name_map = {
            **{f"enc.{i}": f"conv{i + 1}" for i in range(4)},
            **{f"up.{i}": f"upconv{i + 1}" for i in range(3)},
            **{f"dec.{i}": f"conv{i + 5}" for i in range(3)},
            "head": "conv8",
        }

        def remap(sd):
            out = {}
            for k, v in sd.items():
                prefix, leaf = k.rsplit(".", 1)
                out[f"{name_map[prefix]}.{leaf}"] = v
            return out

        unet_params = ln.convert_torch_state_dict(remap(tnet.state_dict()))
        jnet = ln.LocalNetUNet(dtype=DT)

        # transplant LPIPS weights (as in test_torch_parity TestLPIPSParity)
        lpips_params = {"vgg": {}}
        for s, stage in enumerate(tlpips.stages):
            convs = [m for m in stage if isinstance(m, torch.nn.Conv2d)]
            for c, conv in enumerate(convs):
                lpips_params["vgg"][f"conv{s + 1}_{c + 1}"] = {
                    "kernel": conv.weight.detach().numpy().transpose(2, 3, 1, 0),
                    "bias": conv.bias.detach().numpy(),
                }
        for i, lin in enumerate(tlpips.lins):
            lpips_params[f"lin{i}"] = lin.detach().numpy()
        jlpips = vl.LPIPS(dtype=DT)

        torch.manual_seed(1)
        tgt = torch.rand(2, 3, 64, 64)
        ctx = torch.rand(2, 2, 3, 64, 64)
        target = torch.rand(2, 3, 64, 64)
        gamma = 0.6
        shift = torch.tensor(vl._SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(vl._SCALE).view(1, 3, 1, 1)

        y = tnet(tgt, ctx)
        mse_t = torch.nn.functional.mse_loss(y, target)
        lp_t = tlpips((2 * y - 1 - shift) / scale,
                      (2 * target - 1 - shift) / scale).mean()
        loss_t = mse_t * gamma + lp_t * (1 - gamma)
        loss_t.backward()
        want = ln.convert_torch_state_dict(remap(_grad_state_dict(tnet)))

        jt = jnp.asarray(nhwc(tgt))
        jc = jnp.asarray(ctx.numpy().transpose(0, 1, 3, 4, 2))
        jtar = jnp.asarray(nhwc(target))

        def loss_fn(params):
            yj = jnet.apply({"params": params}, jt, jc)
            mse = jnp.mean((yj - jtar) ** 2)
            lp = jnp.mean(jlpips.apply({"params": lpips_params}, yj, jtar))
            return mse * gamma + lp * (1 - gamma)

        loss_j, got = jax.value_and_grad(loss_fn)(unet_params)
        assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-4)
        assert_tree_close(got, want)


@needs_reference
class TestPolicyNet2ReferenceGradients:
    def _pair(self, is_critic):
        ref = _load_ref("policy_net_2")
        torch.manual_seed(2)
        tnet = ref.PolicyNetwork2UNet(is_critic=is_critic)  # train-mode BN
        params = p2.convert_torch_state_dict(tnet.state_dict())
        jnet = p2.PolicyNet2(is_critic=is_critic, dtype=DT)
        return tnet, jnet, params

    def test_masked_logits_gradient(self):
        """Backward through the extra=True path (policy_net_2.py:92-93,
        110-124): conv trunk with train-mode BN, fc chain, scatter-mask,
        standardize. Batch 1 (the reference's non-keepdim mean only
        broadcasts there). Loss = <logits, fixed cotangent>."""
        tnet, jnet, params = self._pair(False)
        torch.manual_seed(3)
        canvas = torch.rand(1, 1, 160, 160)
        feat = torch.rand(1, 1, 1024)
        target = torch.tensor([[[3]]])
        cot = torch.randn(1, 20)

        lt = tnet(canvas, feat, target, extra=True)
        (lt * cot).sum().backward()
        want = p2.convert_torch_state_dict(_grad_state_dict(tnet))

        jcot = jnp.asarray(cot.numpy())

        def loss_fn(pp):
            lj = jnet.apply(
                {"params": pp}, jnp.asarray(nhwc(canvas)),
                jnp.asarray(feat.numpy()[:, 0]), jnp.asarray([3]),
                method=jnet.masked_logits,
            )
            return jnp.sum(lj * jcot)

        got = jax.grad(loss_fn)(params)
        assert_tree_close(got, want, rtol=5e-3)

    def test_critic_value_gradient(self):
        """Backward through the critic head (policy_net_2.py:103-108):
        batch-standardized 2048-d feature -> final_fc -> 1."""
        tnet, jnet, params = self._pair(True)
        torch.manual_seed(4)
        canvas = torch.rand(4, 160, 160)
        feat = torch.rand(4, 1, 1024)
        cot = torch.randn(4)

        vt = tnet(canvas, feat, torch.zeros(4, 1))
        (vt * cot).sum().backward()
        want = p2.convert_torch_state_dict(_grad_state_dict(tnet))

        jcot = jnp.asarray(cot.numpy())

        def loss_fn(pp):
            vj = jnet.apply(
                {"params": pp}, jnp.asarray(canvas.numpy()[..., None]),
                jnp.asarray(feat.numpy()[:, 0]), method=jnet.value,
            )
            return jnp.sum(vj * jcot)

        got = jax.grad(loss_fn)(params)
        assert_tree_close(got, want, rtol=5e-3)

    def test_ppo_actor_critic_gradients(self, monkeypatch):
        """One full PPO epoch's actor and critic loss gradients
        (rovr.py:308-334) vs a torch re-implementation on the REFERENCE
        PolicyNetwork2UNet, seeded identically. Gumbel noise is zeroed on
        BOTH sides (softmax(logits/tau) / log_softmax(logits/tau)) so the
        stochastic layer drops out and the comparison is exact math:
        advantage normalization, the exp-ratio, the clip surrogate, the
        paired-marginal logprob, and the critic MSE."""
        t_actor, j_actor, a_params = self._pair(False)
        t_critic, j_critic, c_params = self._pair(True)

        ref = sys.modules["policy_net_2"]
        monkeypatch.setattr(
            ref.F, "gumbel_softmax",
            lambda logits, tau, hard, dim: torch.softmax(logits / tau, dim),
        )
        monkeypatch.setattr(
            p2, "gumbel_log_softmax",
            lambda logits, rng, tau: jax.nn.log_softmax(
                logits.astype(jnp.float32) / tau, axis=-1
            ),
        )

        torch.manual_seed(5)
        bsz, clip = 4, 0.2
        canvas = torch.rand(bsz, 160, 160)
        feat = torch.rand(bsz, 1, 1024)
        tgt = torch.arange(bsz).remainder(20).reshape(bsz, 1)
        acs = torch.tensor([[1, 2], [3, 4], [0, 5], [7, 6]])
        old_logp = torch.randn(bsz) * 0.1 - 3.0
        rtgs = torch.randn(bsz)

        # ---- torch PPO epoch (re-implementation of rovr.py:299-325, with
        # 1-D value/rtg shapes — the repo's documented convention) ----
        v = t_critic(canvas, feat, tgt.float())
        a_k = rtgs - v.detach()
        a_k = (a_k - a_k.mean()) / (a_k.std() + 1e-10)
        curr_logp = t_actor.logprob(
            canvas, feat, tgt, acs, torch.device("cpu")
        )
        ratio = torch.exp(curr_logp - old_logp)
        l1 = ratio * a_k
        l2 = torch.clamp(ratio, 1 - clip, 1 + clip) * a_k
        actor_loss_t = -torch.min(l1, l2).mean()
        actor_loss_t.backward()
        want_actor = p2.convert_torch_state_dict(_grad_state_dict(t_actor))

        critic_loss_t = torch.nn.functional.mse_loss(
            t_critic(canvas, feat, tgt.float()), rtgs
        )
        critic_loss_t.backward()
        want_critic = p2.convert_torch_state_dict(_grad_state_dict(t_critic))

        # ---- jax PPO epoch (the repo's actual loss ops) ----
        j_canvas = jnp.asarray(canvas.numpy()[..., None])
        j_feat = jnp.asarray(feat.numpy()[:, 0])
        j_tgt = jnp.asarray(tgt.numpy()[:, 0])
        j_acs = jnp.asarray(acs.numpy())
        j_old = jnp.asarray(old_logp.numpy())
        j_rtg = jnp.asarray(rtgs.numpy())
        key = jax.random.PRNGKey(0)  # unused once noise is zeroed

        v0 = j_critic.apply(
            {"params": c_params}, j_canvas, j_feat, method=j_critic.value
        )
        adv = normalized_advantage(j_rtg, v0)

        def actor_loss_fn(pp):
            logp = j_actor.apply(
                {"params": pp}, j_canvas, j_feat, j_tgt, j_acs, key,
                method=j_actor.logprob,
            )
            return ppo_clip_actor_loss(logp, j_old, adv, clip)

        def critic_loss_fn(pp):
            vj = j_critic.apply(
                {"params": pp}, j_canvas, j_feat, method=j_critic.value
            )
            return critic_loss(vj, j_rtg)

        a_loss_j, got_actor = jax.value_and_grad(actor_loss_fn)(a_params)
        c_loss_j, got_critic = jax.value_and_grad(critic_loss_fn)(c_params)

        assert float(a_loss_j) == pytest.approx(
            float(actor_loss_t), rel=1e-4, abs=1e-6
        )
        assert float(c_loss_j) == pytest.approx(float(critic_loss_t), rel=1e-4)
        # Tolerance note (measured): in fp32 the trunk backward's rel-L2
        # disagreement is ~3e-3 (batch-stat norms divide by small-batch
        # statistics, amplifying summation-order noise) and the PPO
        # surrogate's exp-ratio roughly triples it on the early convs
        # (~1e-2). Re-running this exact comparison in float64 collapses it
        # to ~1e-5 (bounded below only by BatchStatNorm's internal fp32
        # stats), i.e. the residual is mutual fp32 noise, not semantics.
        # A real backward-semantics change (e.g. pooling tie handling)
        # shows up at rel-L2 >= 0.1.
        # (the critic path is equally amplified: its axis-0 feature
        # standardization divides by 4-sample per-feature stds)
        assert_tree_close(got_actor, want_actor, rtol=3e-2)
        assert_tree_close(got_critic, want_critic, rtol=3e-2)
