"""Folder-of-frames clip datasets + async device prefetch.

TPU-native replacement for the reference's torch DataLoader path
(reference: rovr/video_ds.py:94-135, rovr/video_ds_explicit.py:74-112,
rovr/test.py:39-41): host-side decode/corrupt runs in a thread pool (backed
by the C++ native loader when built, else cv2), and ready clips are staged
into device memory ahead of consumption so the TPU never waits on PNG decode.

Layout contract is NHWC float32 in [0,1] — images stay channels-last all the
way to the model (TPU conv layout), instead of the reference's NCHW permutes
(video_ds.py:135).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from rovr_tpu.config import DataConfig
from rovr_tpu.data import corruption, synthetic, teacher


def list_clips(root_folder: str) -> List[str]:
    """Sorted clip subfolders (video_ds.py:13)."""
    return sorted(
        d
        for d in os.listdir(root_folder)
        if os.path.isdir(os.path.join(root_folder, d))
    )


def _decode_frame(
    path: str, out_hw: Tuple[int, int], half: int, use_native: bool = True
) -> np.ndarray:
    """Decode one frame, resize to 1024x512, split, resize half to out_hw.

    Parity: video_ds.py:107-113. Prefers the native C++ decoder;
    `use_native=False` (cfg.data.use_native_loader) forces the cv2 path.
    """
    from rovr_tpu.data import native_loader

    if use_native and native_loader.available():
        return native_loader.decode_half(path, out_hw, half)
    import cv2

    frame = cv2.imread(path)
    frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    frame = cv2.resize(frame, (1024, 512))
    halves = np.split(frame, 2, axis=1)
    return cv2.resize(halves[half], (out_hw[1], out_hw[0]))


class VideoFolderDataset:
    """Random-mask corruption dataset. Parity: VideoDataset2 (video_ds.py:9-135).

    Each subfolder of 50 frames yields two videos (left/right half); every
    2nd frame is taken -> 25 frames/video. __getitem__ returns float32 NHWC
    (corrupted, original, masks).
    """

    def __init__(self, cfg: DataConfig, seed: int = 0):
        self.cfg = cfg
        self.root = cfg.root_folder
        self.clips = list_clips(self.root)
        self.seed = seed

    def __len__(self) -> int:
        n = len(self.clips) * 2
        return min(n, 10) if self.cfg.debug_short_dataset else n

    def __getitem__(self, idx: int):
        cfg = self.cfg
        folder = os.path.join(self.root, self.clips[idx // 2])
        names = sorted(os.listdir(folder))
        half = idx % 2
        rng = np.random.default_rng((self.seed, idx))
        frames, corrupted, masks = [], [], []
        for i in range(0, cfg.frames_per_clip, 2):
            frame = _decode_frame(
                os.path.join(folder, names[i]), cfg.frame_size, half,
                use_native=cfg.use_native_loader,
            )
            c, m = corruption.corrupt_frame(
                frame,
                i,
                rng,
                difficulty=cfg.difficulty,
                brightness=cfg.brightness,
                noise=cfg.noise,
                apply_jitter_box=cfg.apply_jitter_box,
            )
            frames.append(frame)
            corrupted.append(c)
            masks.append(m)
        if cfg.stage_uint8:
            # ship uint8; the train step normalizes on device (config.py)
            return (
                np.asarray(corrupted, dtype=np.uint8),
                np.asarray(frames, dtype=np.uint8),
                np.asarray(masks, dtype=np.float32),
            )
        f = np.float32(1.0 / 255.0)
        return (
            np.asarray(corrupted, dtype=np.float32) * f,
            np.asarray(frames, dtype=np.float32) * f,
            np.asarray(masks, dtype=np.float32),
        )


class ExplicitVideoDataset:
    """Teacher-labeled dataset. Parity: VideoDatasetExplicit
    (video_ds_explicit.py:9-112): 20 shuffled frames, structured masks,
    (20,16,2)/(20,3,2) positive/negative context-pair labels.
    """

    def __init__(self, cfg: DataConfig, seed: int = 0):
        self.cfg = cfg
        self.root = cfg.root_folder
        self.clips = list_clips(self.root)
        self.seed = seed

    def __len__(self) -> int:
        n = len(self.clips) * 2
        return min(n, 10) if self.cfg.debug_short_dataset else n

    def __getitem__(self, idx: int):
        cfg = self.cfg
        folder = os.path.join(self.root, self.clips[idx // 2])
        names = sorted(os.listdir(folder))
        half = idx % 2
        rng = np.random.default_rng((self.seed, idx))
        assign = teacher.sample_assignment(rng)
        frames, corrupted, masks = [], [], []
        for i in range(0, 2 * teacher.NUM_FRAMES, 2):
            # shuffled frame order (video_ds_explicit.py:90)
            frame = _decode_frame(
                os.path.join(folder, names[assign.frame_order[i // 2]]),
                cfg.frame_size,
                half,
                use_native=cfg.use_native_loader,
            )
            c, m = corruption.corrupt_frame_explicit(
                frame, assign.frame_masks[i // 2], rng
            )
            frames.append(frame)
            corrupted.append(c)
            masks.append(m)
        f = np.float32(1.0 / 255.0)
        return (
            np.asarray(corrupted, dtype=np.float32) * f,
            np.asarray(frames, dtype=np.float32) * f,
            np.asarray(masks, dtype=np.float32),
            assign.positives,
            assign.negatives,
        )


class SyntheticExplicitDataset:
    """Drop-in ExplicitVideoDataset over synthetic clips (no disk needed)."""

    def __init__(self, cfg: DataConfig, seed: int = 0, length: int = 64):
        self.cfg = cfg
        self.seed = seed
        self.length = 10 if cfg.debug_short_dataset else length

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int):
        h, w = self.cfg.frame_size
        return synthetic.synthetic_explicit_batch(
            (self.seed * 1_000_003 + idx) & 0x7FFFFFFF, h, w
        )


class _WorkerError:
    """Envelope carrying a worker-thread exception to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class DevicePrefetcher:
    """Thread-pool loader + device staging queue.

    Replaces the reference's 32 DataLoader worker processes (test.py:60) with
    threads (decode releases the GIL in cv2/the native loader) and overlaps
    host decode with TPU compute by keeping `depth` batches resident on
    device (or sharded across a mesh when `sharding` is given).
    """

    def __init__(
        self,
        dataset,
        indices: Optional[Sequence[int]] = None,
        num_workers: int = 4,
        depth: int = 2,
        sharding=None,
        to_device: bool = True,
    ):
        import jax

        self._jax = jax
        self.dataset = dataset
        self.indices = list(indices if indices is not None else range(len(dataset)))
        self.sharding = sharding
        self.to_device = to_device
        self._host_q: "queue.Queue" = queue.Queue(maxsize=max(2, depth))
        self._device_q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._workers = [
            threading.Thread(target=self._produce, args=(w, num_workers), daemon=True)
            for w in range(num_workers)
        ]
        self._stager = threading.Thread(target=self._stage, daemon=True)
        self._produced = 0
        self._lock = threading.Lock()
        for t in self._workers:
            t.start()
        self._stager.start()

    def _put(self, q: "queue.Queue", item) -> bool:
        """put() that observes _stop so producers blocked on a full queue can
        exit when the prefetcher is closed early (consumer stopped pulling)."""
        while not self._stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _produce(self, worker_id: int, num_workers: int):
        for pos in range(worker_id, len(self.indices), num_workers):
            if self._stop.is_set():
                return
            try:
                item = self.dataset[self.indices[pos]]
            except BaseException as e:  # propagate to the consumer, don't
                self._put(self._host_q, (pos, _WorkerError(e)))  # hang
                return
            if not self._put(self._host_q, (pos, item)):
                return

    def _stage(self):
        import heapq

        heap: list = []
        next_pos = 0
        total = len(self.indices)
        while next_pos < total and not self._stop.is_set():
            try:
                pos, item = self._host_q.get(timeout=0.1)
            except queue.Empty:
                continue
            if isinstance(item, _WorkerError):
                self._put(self._device_q, item)
                return
            heapq.heappush(heap, (pos, item))
            while heap and heap[0][0] == next_pos:
                _, it = heapq.heappop(heap)
                if self.to_device:
                    if self.sharding is not None:
                        it = tuple(
                            self._jax.device_put(x, self.sharding) for x in it
                        )
                    else:
                        it = tuple(self._jax.device_put(x) for x in it)
                if not self._put(self._device_q, it):
                    return
                next_pos += 1
        self._put(self._device_q, None)

    def __iter__(self) -> Iterator:
        while True:
            item = self._device_q.get()
            if item is None:
                return
            if isinstance(item, _WorkerError):
                raise item.exc
            yield item

    def close(self, timeout: float = 5.0):
        """Stop and reclaim the pipeline: signal stop, then join every worker
        and the stager (their queue ops poll _stop, so they exit promptly
        even when blocked on a full/empty queue)."""
        self._stop.set()
        for t in self._workers:
            t.join(timeout)
        self._stager.join(timeout)
        # free any staged batches still referenced by the queues
        for q in (self._host_q, self._device_q):
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
