"""Batch iterators: the L3 dataloader (SURVEY.md §2 "Dataloader").

Rebuilds the reference's PyTorch Dataset/DataLoader as host-side numpy
batch assembly feeding the PrefetchIterator (features.py): pad/truncate is
already done offline, so a batch is pure `take` + caption sampling. Shapes
are static — batch size is fixed by wrapping around the epoch tail
(train) or padding with repeats + a validity mask (eval) — so jit never
retraces.

Train batches carry K sampled captions per video (`caps_per_video_train`),
the reference's seq-per-img trick: encode each video once, decode K
sequences against it.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from controllable_xgating_tpu.data.features import FeatureStore


class TrainBatchIterator:
    """Infinite shuffled iterator of XE train batches."""

    def __init__(
        self,
        store: FeatureStore,
        caps: np.ndarray,    # [N, S, L]
        pos: np.ndarray,     # [N, S, L]
        ncaps: np.ndarray,   # [N]
        video_indices: np.ndarray,
        batch_size: int,
        caps_per_video: int,
        seed: int = 0,
    ):
        self.store = store
        self.caps = caps
        self.pos = pos
        self.ncaps = ncaps
        self.video_indices = np.asarray(video_indices, np.int64)
        self.batch_size = batch_size
        self.caps_per_video = caps_per_video
        self.rng = np.random.default_rng(seed)
        if len(self.video_indices) == 0:
            raise ValueError("empty split")

    def __iter__(self) -> Iterator[dict]:
        while True:
            perm = self.rng.permutation(self.video_indices)
            # wrap the tail so every batch has the same static size
            pad = (-len(perm)) % self.batch_size
            if pad:
                perm = np.concatenate([perm, perm[:pad]])
            for i in range(0, len(perm), self.batch_size):
                yield self._make_batch(perm[i : i + self.batch_size])

    def _make_batch(self, vids: np.ndarray) -> dict:
        app, motion = self.store.get_batch(vids)
        b, k = len(vids), self.caps_per_video
        caps = np.empty((b, k) + self.caps.shape[2:], self.caps.dtype)
        pos = np.empty_like(caps)
        for row, v in enumerate(vids):
            n = max(int(self.ncaps[v]), 1)
            # sample K caption slots (with replacement iff n < K)
            sel = (
                self.rng.choice(n, k, replace=False)
                if n >= k
                else self.rng.integers(0, n, k)
            )
            caps[row] = self.caps[v, sel]
            pos[row] = self.pos[v, sel]
        batch = {
            "app": app,
            "motion": motion,
            "caps": caps.astype(np.int32),
            "pos": pos.astype(np.int32),
            "video_indices": vids.astype(np.int32),
        }
        mask = self.store.frame_mask(vids)
        if mask is not None:
            batch["frame_mask"] = mask
        return batch

    def steps_per_epoch(self) -> int:
        return -(-len(self.video_indices) // self.batch_size)


def eval_batches(
    store: FeatureStore,
    video_indices: np.ndarray,
    batch_size: int,
) -> Iterator[dict]:
    """Fixed-order eval batches; last batch padded with repeats + mask."""
    video_indices = np.asarray(video_indices, np.int64)
    for i in range(0, len(video_indices), batch_size):
        chunk = video_indices[i : i + batch_size]
        valid = len(chunk)
        if valid < batch_size:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], batch_size - valid)]
            )
        app, motion = store.get_batch(chunk)
        batch = {
            "app": app,
            "motion": motion,
            "video_indices": chunk.astype(np.int32),
            "num_valid": valid,
        }
        mask = store.frame_mask(chunk)
        if mask is not None:
            batch["frame_mask"] = mask
        yield batch
