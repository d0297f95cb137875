"""Structured metrics logging: JSONL always, TensorBoard when available.

First-class replacement for the reference's inline SummaryWriter calls and
printf-debugging (reference: rovr/rovr.py:63-65,241-243,336-337,
rovr/train_local_net_unet.py:95-114, rovr/logger.py:7-48 — the standalone
Logger that nothing imports). Scalar conventions match the reference's tags
so dashboards line up.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsWriter:
    """JSONL scalar/metadata writer with optional TensorBoard mirroring."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard.writer import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir, flush_secs=10)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: Any, step: int):
        v = float(value)
        self._f.write(
            json.dumps({"t": time.time(), "tag": tag, "value": v, "step": step})
            + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, v, step)

    def scalars(self, values: Dict[str, Any], step: int):
        for tag, v in values.items():
            self.scalar(tag, v, step)

    def image(self, tag: str, image, step: int):
        """image: (H, W, C) float in [0,1]. TensorBoard when available, else a
        PNG under <log_dir>/images/ — the grids always ship, matching the
        reference's always-written image grids (train_local_net_unet.py:117-119)."""
        import numpy as np

        img = np.asarray(image)
        if self._tb is not None:
            self._tb.add_image(tag, img.transpose(2, 0, 1), step)
            return
        from rovr_tpu.utils.png import write_png

        img_dir = os.path.join(self.log_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        safe_tag = tag.replace("/", "_")
        u8 = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        write_png(os.path.join(img_dir, f"{safe_tag}_{step:08d}.png"), u8)

    def text(self, tag: str, text: str, step: int):
        self._f.write(
            json.dumps({"t": time.time(), "tag": tag, "text": text, "step": step})
            + "\n"
        )
        if self._tb is not None:
            self._tb.add_text(tag, text, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
