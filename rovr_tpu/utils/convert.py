"""Reference-checkpoint migration: torch `.pt` files -> framework params.

A user of the reference arrives with torch checkpoints: UNet pretrains
(train_local_net_unet.py:120-127), imitation warm starts
(imitation_learning.py:102-108), full RL states (test.py:88-93, prefixes
actor2./critic2./local_net./video_encoder./history_encoder./lpips.), and
the pretrained metric nets (torchvision resnet50/raft_small, pip lpips).
This module routes each through the per-model converters
(models/*.convert_*) and returns `rl.init_state`-shaped warm-start kwargs,
so `python -m rovr_tpu convert` + `--warm_start` replaces the reference's
hand-edited hardcoded checkpoint paths (rovr.py:37-42).

torch stays an optional dependency: it is imported inside the functions,
only when a .pt file actually needs reading.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

KINDS = (
    "local_net",    # UNet pretrain ckpt -> local_net_params
    "policy2",      # imitation ckpt -> actor2_params
    "policy1",      # pn1 ckpt -> actor1_params
    "rovr",         # full RL state (test.py:88-93) -> several trees
    "resnet50",     # torchvision resnet50 state dict -> vp backbone
    "vgg_lpips",    # pip lpips.LPIPS(net='vgg') state dict -> lpips_params
    "raft",         # torchvision raft_small state dict -> raft params
)


def _load_state_dict(path: str) -> Dict[str, Any]:
    """torch.load a checkpoint and unwrap the reference's
    {'model_state_dict': ...} envelope when present."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    return {k: v for k, v in ckpt.items()}


def _split_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    p = prefix + "."
    return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}


def _lpips_package_to_converter_inputs(
    sd: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """pip lpips.LPIPS(net='vgg') state dict -> (vgg_state, lin_state).

    lpips registers each torchvision features module under its GLOBAL index
    inside per-stage slices (pretrained_networks.vgg16: slice1.add_module
    (str(x), features[x])), so 'net.slice2.5.weight' IS features.5 — the
    slice number can be dropped.
    """
    vgg_state, lin_state = {}, {}
    for k, v in sd.items():
        if k.startswith("net.slice"):
            idx_and_leaf = k.split(".", 2)[2]  # '5.weight'
            vgg_state[f"features.{idx_and_leaf}"] = v
        elif k.startswith("lin"):
            lin_state[k] = v
    return vgg_state, lin_state


def convert_reference_checkpoint(
    kind: str, path: str
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert one reference/torch checkpoint.

    Returns `(init_params, report)`: `init_params` maps rl.init_state
    warm-start kwarg names (local_net_params / actor2_params / ... ) to
    converted param pytrees — plus `vp_backbone_params` / `raft_params`,
    which need the merge helpers below; `report` lists what was converted
    and what was skipped (and why).
    """
    from rovr_tpu.models import action_lstm, local_net, policy_net_1
    from rovr_tpu.models import policy_net_2, resnet, vgg_lpips
    from rovr_tpu.models import raft as raft_mod

    if kind not in KINDS:
        raise ValueError(f"unknown kind {kind!r}; expected one of {KINDS}")
    sd = _load_state_dict(path)
    out: Dict[str, Any] = {}
    report: Dict[str, Any] = {"kind": kind, "converted": [], "skipped": []}

    def _try(name: str, fn):
        try:
            out[name] = fn()
            report["converted"].append(name)
        except Exception as e:  # shape/geometry mismatch -> documented skip
            report["skipped"].append(f"{name}: {type(e).__name__}: {e}")

    if kind == "local_net":
        _try("local_net_params", lambda: local_net.convert_torch_state_dict(sd))
    elif kind == "policy2":
        _try("actor2_params", lambda: policy_net_2.convert_torch_state_dict(sd))
    elif kind == "policy1":
        _try("actor1_params", lambda: policy_net_1.convert_torch_state_dict(sd))
    elif kind == "resnet50":
        _try("vp_backbone_params", lambda: resnet.convert_torch_state_dict(sd))
    elif kind == "raft":
        _try("raft_params", lambda: raft_mod.convert_raft_state_dict(sd))
    elif kind == "vgg_lpips":
        def _conv():
            vgg_state, lin_state = _lpips_package_to_converter_inputs(sd)
            return vgg_lpips.convert_lpips_weights(vgg_state, lin_state)

        _try("lpips_params", _conv)
    elif kind == "rovr":
        # Full RL state: rover.state_dict() with submodule prefixes
        # (test.py:88-93; module attrs wired in rovr.py:44-58).
        for name, prefix, fn in (
            ("local_net_params", "local_net", local_net.convert_torch_state_dict),
            ("actor2_params", "actor2", policy_net_2.convert_torch_state_dict),
            ("critic2_params", "critic2", policy_net_2.convert_torch_state_dict),
        ):
            sub = _split_prefix(sd, prefix)
            if sub:
                _try(name, lambda fn=fn, sub=sub: fn(sub))
            else:
                report["skipped"].append(f"{name}: no '{prefix}.' keys")
        enc = _split_prefix(sd, "video_encoder")
        if enc:
            # ResnetFeatureExtractor = frozen resnet50 + Linear(2048->768)
            # (resnet_extractor.py:8-16). Only the backbone maps onto the
            # re-specified VideoProcessor (models/video_processor.py
            # docstring); its projection heads differ by design.
            _try("vp_backbone_params", lambda: resnet.convert_torch_state_dict(
                {k[len("resnet."):]: v for k, v in enc.items()
                 if k.startswith("resnet.")} or enc))
        hist = _split_prefix(sd, "history_encoder")
        if hist:
            # Cell kernels convert 1:1 only when the token geometry matches;
            # the rebuild deviates by design (action_lstm.py docstring), so
            # a mismatch lands in `skipped`, not an error.
            _try("lstm_cell_params", lambda: action_lstm.convert_torch_lstm_cell(hist))
        lp = _split_prefix(sd, "lpips")
        if lp:
            def _conv_lp():
                vgg_state, lin_state = _lpips_package_to_converter_inputs(lp)
                return vgg_lpips.convert_lpips_weights(vgg_state, lin_state)

            _try("lpips_params", _conv_lp)
    return out, report


def merge_vp_backbone(vp_params: Dict, backbone_params: Dict) -> Dict:
    """Splice converted ResNet-50 weights into a VideoProcessor param tree
    (fresh projection heads stay — they have no reference twin)."""
    merged = dict(vp_params)
    merged["backbone"] = backbone_params
    return merged


def save_converted(out_dir: str, init_params: Dict[str, Any]) -> str:
    """Persist converted trees as one Orbax checkpoint (step 0)."""
    from rovr_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(out_dir, max_to_keep=1)
    import numpy as np
    import jax

    host = jax.tree.map(np.asarray, init_params)
    mgr.save(0, host, force=True)
    mgr.wait()
    mgr.close()
    return os.path.abspath(out_dir)


def load_converted(out_dir: str) -> Optional[Dict[str, Any]]:
    """Load a save_converted checkpoint back as init_state kwargs."""
    from rovr_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(out_dir, max_to_keep=1)
    try:
        return mgr.restore()
    finally:
        mgr.close()
