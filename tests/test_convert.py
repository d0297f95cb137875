"""Checkpoint migration (utils/convert.py): reference torch .pt files ->
framework warm-start trees, including the reference's checkpoint envelopes
(train_local_net_unet.py:120-127 pretrain, test.py:88-93 full RL state)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference/rovr")
pytestmark = pytest.mark.skipif(not REF.is_dir(), reason="no reference tree")

from rovr_tpu.utils import convert  # noqa: E402


def _load_ref(name):
    # datasets/models import torchvision.transforms.functional but never use
    # it (see tests/test_reference_parity.py) — stub it
    import types

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


class TestConvertPretrain:
    def test_envelope_and_forward_parity(self, tmp_path):
        """A pretrain checkpoint in the reference's exact envelope
        ({'epoch', 'model_state_dict', ...}, train_local_net_unet.py:120-127)
        converts to local_net_params with forward parity."""
        ref = _load_ref("local_net")
        torch.manual_seed(0)
        tnet = ref.LocalNetworkUNetNorm()
        path = tmp_path / "2000.pt"
        torch.save(
            {"epoch": 2000, "model_state_dict": tnet.state_dict(),
             "losses": [0.1]},
            path,
        )

        init_params, report = convert.convert_reference_checkpoint(
            "local_net", str(path)
        )
        assert report["converted"] == ["local_net_params"]
        assert not report["skipped"]

        from rovr_tpu.models import local_net as ln

        jnet = ln.LocalNetUNet(dtype=jnp.float32)
        tgt = torch.rand(1, 3, 64, 64)
        ctx = torch.rand(1, 2, 3, 64, 64)
        with torch.no_grad():
            yt = tnet(tgt, ctx)
        yj = jnet.apply(
            {"params": init_params["local_net_params"]},
            jnp.asarray(tgt.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(ctx.numpy().transpose(0, 1, 3, 4, 2)),
        )
        np.testing.assert_allclose(
            np.asarray(yj), yt.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=2e-5,
        )


class TestConvertFullROVRState:
    def test_prefix_split(self, tmp_path):
        """The full RL checkpoint (rover.state_dict() with submodule
        prefixes, test.py:88-93) splits into per-model trees; absent
        submodules land in the skip report, not errors."""
        ln_ref = _load_ref("local_net")
        pn2_ref = _load_ref("policy_net_2")
        torch.manual_seed(1)
        sd = {}
        for prefix, mod in (
            ("local_net", ln_ref.LocalNetworkUNetNorm()),
            ("actor2", pn2_ref.PolicyNetwork2UNet()),
            ("critic2", pn2_ref.PolicyNetwork2UNet(is_critic=True)),
        ):
            for k, v in mod.state_dict().items():
                sd[f"{prefix}.{k}"] = v
        path = tmp_path / "5.pt"
        torch.save(
            {"epoch": 5, "model_state_dict": sd,
             "optimizers_state_dict": []},
            path,
        )

        init_params, report = convert.convert_reference_checkpoint(
            "rovr", str(path)
        )
        assert set(report["converted"]) == {
            "local_net_params", "actor2_params", "critic2_params"
        }
        import jax

        for tree in init_params.values():
            leaves = jax.tree_util.tree_leaves(tree)
            assert leaves and all(np.asarray(x).size > 0 for x in leaves)
        assert init_params["actor2_params"].keys() == \
            init_params["critic2_params"].keys()


class TestSaveLoadRoundtrip:
    def test_roundtrip(self, tmp_path):
        tree = {
            "local_net_params": {"a": np.arange(6, dtype=np.float32)},
            "actor2_params": {"b": {"kernel": np.ones((2, 3), np.float32)}},
        }
        out = convert.save_converted(str(tmp_path / "conv"), tree)
        back = convert.load_converted(out)
        np.testing.assert_array_equal(
            back["local_net_params"]["a"], tree["local_net_params"]["a"]
        )
        np.testing.assert_array_equal(
            back["actor2_params"]["b"]["kernel"],
            tree["actor2_params"]["b"]["kernel"],
        )


class TestMergeVPBackbone:
    def test_merge(self):
        vp = {"backbone": {"old": np.zeros(2)}, "feat_head": {"k": np.ones(2)}}
        merged = convert.merge_vp_backbone(vp, {"new": np.ones(3)})
        assert "new" in merged["backbone"] and "old" not in merged["backbone"]
        np.testing.assert_array_equal(merged["feat_head"]["k"], np.ones(2))
