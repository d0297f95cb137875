"""Numeric parity vs PyTorch twins with transplanted weights.

SURVEY.md §4(c): parity tests vs Torch reference outputs on fixed seeds. The
torch modules here are the CPU twins from benchmarks/torch_baseline.py (the
reference itself can't run: its video_processor.py is missing and
lpips/torchvision aren't installed). Weights are copied torch -> flax and
outputs compared in float32, which pins layout conversion (NCHW->NHWC,
OIHW->HWIO), padding, pooling, ConvTranspose semantics, and BN-eval math.
"""

import sys
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
from rovr_tpu.models import resnet as rn  # noqa: E402
from rovr_tpu.models import vgg_lpips as vl  # noqa: E402

DT = jnp.float32


def nhwc(x: "torch.Tensor") -> np.ndarray:
    return x.detach().numpy().transpose(0, 2, 3, 1)


class TestLocalNetParity:
    def test_forward_matches_torch(self):
        torch.manual_seed(0)
        tnet = tb.LocalUNet().eval()
        # remap the bench twin's names to the reference checkpoint naming
        # (local_net.py:12-39) that convert_torch_state_dict accepts
        name_map = {
            **{f"enc.{i}": f"conv{i + 1}" for i in range(4)},
            **{f"up.{i}": f"upconv{i + 1}" for i in range(3)},
            **{f"dec.{i}": f"conv{i + 5}" for i in range(3)},
            "head": "conv8",
        }
        sd = {}
        for k, v in tnet.state_dict().items():
            prefix, leaf = k.rsplit(".", 1)
            sd[f"{name_map[prefix]}.{leaf}"] = v
        params = ln.convert_torch_state_dict(sd)
        jnet = ln.LocalNetUNet(dtype=DT)

        tgt = torch.rand(2, 3, 64, 64)
        ctx = torch.rand(2, 2, 3, 64, 64)
        with torch.no_grad():
            yt = tnet(tgt, ctx)
        yj = jnet.apply(
            {"params": params},
            jnp.asarray(nhwc(tgt)),
            jnp.asarray(ctx.numpy().transpose(0, 1, 3, 4, 2)),
        )
        np.testing.assert_allclose(
            np.asarray(yj), nhwc(yt), atol=2e-5, rtol=1e-4
        )


class TestResNetParity:
    def test_pooled_features_match_torch(self):
        torch.manual_seed(1)
        tnet = tb.ResNet50().eval()
        # perturb BN running stats so the parity is non-trivial
        with torch.no_grad():
            for m in tnet.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.5, 0.5)
                    m.running_var.uniform_(0.5, 2.0)

        # export in torchvision naming for convert_torch_state_dict
        sd = {}
        sd["conv1.weight"] = tnet.conv1.weight
        for k in ("weight", "bias", "running_mean", "running_var"):
            sd[f"bn1.{k}"] = getattr(tnet.bn1, k)
        stage_sizes = rn.STAGE_SIZES
        blocks = list(tnet.blocks)
        idx = 0
        for s, n in enumerate(stage_sizes):
            for b in range(n):
                blk = blocks[idx]
                idx += 1
                t = f"layer{s + 1}.{b}"
                for cn, bn_ in (("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")):
                    sd[f"{t}.{cn}.weight"] = getattr(blk, "c" + cn[-1]).weight
                    tb_bn = getattr(blk, "b" + bn_[-1])
                    for k in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"{t}.{bn_}.{k}"] = getattr(tb_bn, k)
                if blk.down is not None:
                    sd[f"{t}.downsample.0.weight"] = blk.down[0].weight
                    for k in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"{t}.downsample.1.{k}"] = getattr(blk.down[1], k)
        sd = {k: v.detach().numpy() for k, v in sd.items()}

        params = rn.convert_torch_state_dict(sd)
        jnet = rn.ResNet50(dtype=DT)
        x = torch.rand(2, 3, 64, 64)
        with torch.no_grad():
            yt = tnet(x).numpy()
        yj = np.asarray(jnet.apply({"params": params}, jnp.asarray(nhwc(x))))
        np.testing.assert_allclose(yj, yt, atol=1e-4, rtol=1e-3)


class TestLPIPSParity:
    def test_distance_matches_torch(self):
        torch.manual_seed(2)
        tnet = tb.VGGLpips().eval()
        # torch twin takes pre-scaled inputs; flax applies the lpips scaling
        # internally. Transplant weights and feed the flax module raw [0,1]
        # inputs, the torch twin the equivalently scaled ones.
        params = {"vgg": {}}
        for s, stage in enumerate(tnet.stages):
            convs = [m for m in stage if isinstance(m, torch.nn.Conv2d)]
            for c, conv in enumerate(convs):
                params["vgg"][f"conv{s + 1}_{c + 1}"] = {
                    "kernel": conv.weight.detach().numpy().transpose(2, 3, 1, 0),
                    "bias": conv.bias.detach().numpy(),
                }
        for i, lin in enumerate(tnet.lins):
            params[f"lin{i}"] = lin.detach().numpy()

        jnet = vl.LPIPS(dtype=DT)
        x = torch.rand(2, 3, 64, 64)
        y = torch.rand(2, 3, 64, 64)
        shift = torch.tensor(vl._SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(vl._SCALE).view(1, 3, 1, 1)
        with torch.no_grad():
            dt_ = tnet((2 * x - 1 - shift) / scale, (2 * y - 1 - shift) / scale)
        dj = jnet.apply(
            {"params": params}, jnp.asarray(nhwc(x)), jnp.asarray(nhwc(y))
        )
        np.testing.assert_allclose(
            np.asarray(dj), dt_.numpy(), atol=1e-4, rtol=1e-3
        )

    def test_lpips_weight_converter_shapes(self):
        """convert_lpips_weights maps torchvision-style key names."""
        rng = np.random.default_rng(0)
        conv_idx = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
        plan = [(3, 64), (64, 128), (128, 256), (256, 512), (512, 512)]
        vgg_state = {}
        for s, idxs in enumerate(conv_idx):
            cin, cout = plan[s]
            for c, i in enumerate(idxs):
                ci = cin if c == 0 else cout
                vgg_state[f"features.{i}.weight"] = rng.normal(
                    size=(cout, ci, 3, 3)
                ).astype(np.float32)
                vgg_state[f"features.{i}.bias"] = np.zeros(cout, np.float32)
        lin_state = {
            f"lin{i}.model.1.weight": rng.uniform(
                size=(1, c, 1, 1)
            ).astype(np.float32)
            for i, c in enumerate((64, 128, 256, 512, 512))
        }
        params = vl.convert_lpips_weights(vgg_state, lin_state)
        jnet = vl.LPIPS(dtype=DT)
        x = jnp.zeros((1, 32, 32, 3))
        ref = jnet.init(jax.random.PRNGKey(0), x, x)["params"]
        ref_shapes = jax.tree.map(lambda a: a.shape, ref)
        got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, params)
        assert jax.tree.structure(ref_shapes) == jax.tree.structure(got_shapes)
        assert jax.tree.leaves(ref_shapes) == jax.tree.leaves(got_shapes)
