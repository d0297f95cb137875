"""Direct parity vs the REFERENCE'S OWN modules at /root/reference/rovr.

Unlike tests/test_torch_parity.py (which pins layout conversion against
freshly written torch twins), these tests import the reference's actual
source files — local_net.py, policy_net_1.py, policy_net_2.py,
action_lstm.py, video_ds.py, video_ds_explicit.py — transplant their
torch-initialized weights through the models' convert_torch_state_dict
helpers, and assert forward/numeric parity.

Import notes: torchvision is absent in this environment, but the datasets
import only `torchvision.transforms.functional as F` and never use it
(grep-verified), so a stub module suffices. The RL orchestrator rovr.py is
NOT importable (lpips + the missing video_processor.py), so its math is
covered by ops-level unit tests instead.

RNG bridging for the datasets: the reference draws from the global `random`
(scalars) and `np.random` (arrays) modules; _MirrorRNG exposes the
np.random.Generator.integers API while delegating to exactly those global
streams, so seeding both globals makes the reference and rovr_tpu consume
identical draw sequences.
"""

import random
import sys
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference/rovr")
pytestmark = [
    pytest.mark.skipif(not REF.is_dir(), reason="no reference tree"),
    pytest.mark.slow,  # full-tier only; fast tier: -m 'not slow'
]


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


class _MirrorRNG:
    """np.random.Generator.integers facade over the reference's globals:
    scalar draws -> random.randint (inclusive), array draws ->
    np.random.randint (exclusive)."""

    def integers(self, lo, hi, size=None, dtype=None):
        if size is None:
            return random.randint(lo, hi - 1)
        return np.random.randint(lo, hi, size, dtype=dtype or np.int64)


# ---------------------------------------------------------------------------
# Models


class TestLocalNetReferenceParity:
    def test_forward(self):
        ref = _load_ref("local_net")
        torch.manual_seed(0)
        tnet = ref.LocalNetworkUNetNorm()
        from rovr_tpu.models import local_net as ln

        params = ln.convert_torch_state_dict(tnet.state_dict())
        jnet = ln.LocalNetUNet(dtype=jnp.float32)

        tgt = torch.rand(2, 3, 64, 64)
        ctx = torch.rand(2, 2, 3, 64, 64)
        with torch.no_grad():
            yt = tnet(tgt, ctx)  # local_net.py:46-72
        yj = jnet.apply(
            {"params": params},
            jnp.asarray(nhwc(tgt)),
            jnp.asarray(ctx.numpy().transpose(0, 1, 3, 4, 2)),
        )
        np.testing.assert_allclose(
            np.asarray(yj), nhwc(yt), rtol=1e-4, atol=2e-5
        )


class TestPolicyNet1ReferenceParity:
    def _pair(self, is_critic):
        ref = _load_ref("policy_net_1")
        torch.manual_seed(1)
        tnet = ref.PolicyNetwork1UNet(is_critic=is_critic)  # train mode: BN
        from rovr_tpu.models import policy_net_1 as p1

        params = p1.convert_torch_state_dict(tnet.state_dict())
        jnet = p1.PolicyNet1(is_critic=is_critic, dtype=jnp.float32)
        return tnet, jnet, params

    def test_critic_value(self):
        tnet, jnet, params = self._pair(True)
        img = torch.rand(3, 3, 80, 80)
        ctx = torch.rand(3, 3, 80, 80)
        with torch.no_grad():
            vt = tnet(img, ctx)  # policy_net_1.py:104-105
        vj = jnet.apply(
            {"params": params}, jnp.asarray(nhwc(img)), jnp.asarray(nhwc(ctx)),
            method=jnet.value,
        )
        np.testing.assert_allclose(np.asarray(vj), vt.numpy(), rtol=2e-4,
                                   atol=1e-4)

    def test_actor_deterministic(self, monkeypatch):
        """Replace Gumbel noise with zeros on BOTH sides: the reference's
        forward (policy_net_1.py:96-103) then reduces to a deterministic
        softmax over standardized logits; batch size 1 because the
        reference's non-keepdim mean only broadcasts there."""
        tnet, jnet, params = self._pair(False)
        ref = sys.modules["policy_net_1"]
        monkeypatch.setattr(
            ref.F, "gumbel_softmax",
            lambda logits, tau, hard, dim: torch.softmax(logits / tau, dim),
        )
        img = torch.rand(1, 3, 80, 80)
        ctx = torch.rand(1, 3, 80, 80)
        with torch.no_grad():
            a_t, lp_t = tnet(img, ctx)
        from rovr_tpu.models.layers import standardize

        logits = jnet.apply(
            {"params": params}, jnp.asarray(nhwc(img)), jnp.asarray(nhwc(ctx)),
            method=jnet.logits,
        )
        logp = jax.nn.log_softmax(
            standardize(logits, axis=1, eps=0.1) / jnet.temperature, axis=-1
        )
        assert int(jnp.argmax(logp, axis=1)[0]) == int(a_t[0])
        np.testing.assert_allclose(
            float(jnp.max(logp, axis=1)[0]), float(lp_t[0]), rtol=1e-3,
            atol=1e-4,
        )


class TestPolicyNet2ReferenceParity:
    def _pair(self, is_critic):
        ref = _load_ref("policy_net_2")
        torch.manual_seed(2)
        tnet = ref.PolicyNetwork2UNet(is_critic=is_critic)
        from rovr_tpu.models import policy_net_2 as p2

        params = p2.convert_torch_state_dict(tnet.state_dict())
        jnet = p2.PolicyNet2(is_critic=is_critic, dtype=jnp.float32)
        return tnet, jnet, params

    def test_masked_logits(self):
        """The extra=True raw-masked-logits path (policy_net_2.py:92-93,
        110-124) is fully deterministic. Batch 1 (non-keepdim mean)."""
        tnet, jnet, params = self._pair(False)
        canvas = torch.rand(1, 1, 160, 160)
        feat = torch.rand(1, 1, 1024)
        # scatter_ (policy_net_2.py:121) needs a 2-D index post-squeeze(1)
        target = torch.tensor([[[3]]])
        with torch.no_grad():
            lt = tnet(canvas, feat, target, extra=True)
        lj = jnet.apply(
            {"params": params},
            jnp.asarray(nhwc(canvas)),
            jnp.asarray(feat.numpy()[:, 0]),
            jnp.asarray([3]),
            method=jnet.masked_logits,
        )
        assert float(lj[0, 3]) == pytest.approx(float(lt[0, 3]), abs=1e-5)
        np.testing.assert_allclose(np.asarray(lj), lt.numpy(), rtol=2e-3,
                                   atol=2e-4)

    def test_critic_value(self):
        tnet, jnet, params = self._pair(True)
        canvas = torch.rand(4, 160, 160)  # critic unsqueezes the channel
        feat = torch.rand(4, 1, 1024)
        with torch.no_grad():
            vt = tnet(canvas, feat, torch.zeros(4, 1))
        vj = jnet.apply(
            {"params": params},
            jnp.asarray(canvas.numpy()[..., None]),
            jnp.asarray(feat.numpy()[:, 0]),
            method=jnet.value,
        )
        np.testing.assert_allclose(np.asarray(vj), vt.numpy(), rtol=2e-3,
                                   atol=2e-4)


class TestActionLSTMReferenceParity:
    def test_cell_recurrence(self):
        """The recurrence itself (action_lstm.py:13,34) converts 1:1; the
        surrounding token geometry deviates by design (module docstring)."""
        ref = _load_ref("action_lstm")
        torch.manual_seed(3)
        tnet = ref.ActionLSTM(hidden_dim=32, num_layers=1, batch_size=2)
        from flax import linen as nn

        from rovr_tpu.models.action_lstm import convert_torch_lstm_cell

        cell = nn.OptimizedLSTMCell(32)
        params = convert_torch_lstm_cell(tnet.state_dict())
        carry = (jnp.zeros((2, 32)), jnp.zeros((2, 32)))
        for step in range(4):
            torch.manual_seed(10 + step)
            action = torch.randint(0, 48, (2, 3))
            patches = torch.rand(2, 3, 3, 16, 16)
            with torch.no_grad():
                tnet(action, patches)  # updates tnet.hx/cx in place
            x = jnp.concatenate(
                [
                    jnp.asarray(action.numpy(), jnp.float32) / 48.0,
                    jnp.asarray(patches.numpy().reshape(2, -1)),
                ],
                axis=1,
            )
            # flax carry is (c, h); compare both to torch's (cx, hx)
            carry, h = cell.apply({"params": params}, carry, x)
            np.testing.assert_allclose(
                np.asarray(h), tnet.hx.numpy(), rtol=1e-4, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(carry[0]), tnet.cx.numpy(), rtol=1e-4, atol=1e-5
            )


# ---------------------------------------------------------------------------
# Datasets


class TestVideoDS2ReferenceParity:
    def _ref_ds(self, difficulty):
        vd = _load_ref("video_ds")
        ds = object.__new__(vd.VideoDataset2)
        ds.brightness, ds.noise, ds.difficulty = 40, 20, difficulty
        return ds

    @pytest.mark.parametrize("difficulty", [0, 1, 2])
    def test_corrupt_frame(self, difficulty):
        from rovr_tpu.data import corruption

        ds = self._ref_ds(difficulty)
        for seed in range(8):
            frame = (np.random.default_rng(seed).random((96, 128, 3)) * 255
                     ).astype(np.uint8)
            for frame_index in (0, 7, 13, 40):
                random.seed(seed * 100 + frame_index)
                np.random.seed(seed * 100 + frame_index)
                ref_c, ref_m = ds.corrupt_frame(frame.copy(), frame_index)
                random.seed(seed * 100 + frame_index)
                np.random.seed(seed * 100 + frame_index)
                got_c, got_m = corruption.corrupt_frame(
                    frame.copy(), frame_index, _MirrorRNG(),
                    difficulty=difficulty,
                )
                assert np.array_equal(np.asarray(ref_c, np.int64),
                                      np.asarray(got_c, np.int64))
                assert np.array_equal(ref_m, got_m)


class TestVideoDSExplicitReferenceParity:
    def _ref_ds(self, seed):
        vde = _load_ref("video_ds_explicit")
        ds = object.__new__(vde.VideoDatasetExplicit)
        ds.brightness, ds.noise, ds.difficulty = 40, 20, 2
        np.random.seed(seed)
        ds.new_random()  # video_ds_explicit.py:21-32
        return ds

    def test_groups_and_tables(self):
        from rovr_tpu.data import teacher

        for seed in range(6):
            ds = self._ref_ds(seed)
            groups = teacher._make_groups(np.asarray(ds.f))
            assert [list(map(int, g)) for g in groups] == [
                list(map(int, g)) for g in ds.helper
            ]
            np.testing.assert_array_equal(
                teacher.choose_frame_masks(groups, np.asarray(ds.l)),
                ds.choose_frame_masks(),
            )
            np.testing.assert_array_equal(
                teacher.generate_solutions(groups).astype(np.float64),
                ds.generate_solutions(),
            )
            np.testing.assert_array_equal(
                teacher.generate_negative_solutions(groups).astype(np.float64),
                ds.generate_negative_solutions(),
            )

    def test_corrupt_frame(self):
        from rovr_tpu.data import corruption

        ds = self._ref_ds(0)
        frame = (np.random.default_rng(5).random((256, 256, 3)) * 255
                 ).astype(np.uint8)
        locations = [int(x) for x in ds.choose_frame_masks()[4]]
        random.seed(42)
        ref_c, ref_m = ds.corrupt_frame(frame.copy(), locations)
        random.seed(42)
        got_c, got_m = corruption.corrupt_frame_explicit(
            frame.copy(), locations, _MirrorRNG()
        )
        assert np.array_equal(ref_c, got_c)
        assert np.array_equal(ref_m, got_m)
