"""Feature store + host->HBM pipeline.

Rebuilds the reference's HDF5/npy feature loading (SURVEY.md §2 "Feature
store" / "Dataloader") as a TPU-first host pipeline:

  * features live in one HDF5 file: datasets `app` [N, T, Da] and `motion`
    [N, T, Dm] aligned with info.json's video order;
  * the whole store is small (MSR-VTT ~2.6 GB f32) so by default it is
    loaded to host RAM once, making batch gather a pure numpy take;
  * `PrefetchIterator` overlaps host batch assembly + H2D transfer with
    device compute via a background thread and `jax.device_put` onto the
    (possibly sharded) target — the "double-buffered HBM prefetch" of
    BASELINE.json's north star.

Feature time axes are padded/truncated to a fixed `num_frames` so shapes are
static under jit.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import h5py
import numpy as np


def write_feature_file(
    path: str,
    app: np.ndarray,
    motion: np.ndarray,
    nframes: Optional[np.ndarray] = None,
) -> None:
    """Write an aligned feature file. app [N,T,Da], motion [N,T,Dm].

    `nframes` [N] records each video's TRUE number of valid timesteps after
    fitting to T (shorter videos are zero-padded — MSVD has variable clip
    lengths); loaders turn it into frame masks so attention/summary/LSTM
    never consume pad frames. Omitted = every frame valid (legacy files).
    """
    if app.shape[:2] != motion.shape[:2]:
        raise ValueError("app/motion must align on (num_videos, num_frames)")
    with h5py.File(path, "w") as f:
        f.create_dataset("app", data=app.astype(np.float32))
        f.create_dataset("motion", data=motion.astype(np.float32))
        if nframes is not None:
            nframes = np.asarray(nframes, np.int32)
            if nframes.shape != (app.shape[0],):
                raise ValueError("nframes must be [num_videos]")
            if nframes.max(initial=0) > app.shape[1] or nframes.min(initial=1) < 1:
                raise ValueError("nframes values must be in [1, num_frames]")
            f.create_dataset("nframes", data=nframes)


class FeatureStore:
    """HDF5-backed per-video feature arrays with optional RAM cache."""

    def __init__(self, path: str, num_frames: int, in_memory: bool = True):
        self.path = path
        self.num_frames = num_frames
        self._file: Optional[h5py.File] = None
        self._app: Optional[np.ndarray] = None
        self._motion: Optional[np.ndarray] = None
        self.frame_counts: Optional[np.ndarray] = None
        with h5py.File(path, "r") as f:
            self.num_videos, t, self.app_dim = f["app"].shape
            self.motion_dim = f["motion"].shape[2]
            if "nframes" in f:
                # stored counts refer to the on-disk time axis; when
                # _fit_frames subsamples t -> num_frames the valid frames
                # stay a prefix (uniform subsample preserves order), so the
                # count after fitting = how many subsample indices land
                # inside the valid prefix
                counts = np.asarray(f["nframes"], np.int32)
                if t > num_frames:
                    idx = np.linspace(0, t - 1, num_frames).round().astype(np.int64)
                    counts = (idx[None, :] < counts[:, None]).sum(1).astype(np.int32)
                self.frame_counts = np.maximum(counts, 1)
            if in_memory:
                self._app = _fit_frames(f["app"][:], num_frames)
                self._motion = _fit_frames(f["motion"][:], num_frames)
        if not in_memory:
            self._file = h5py.File(path, "r")

    def get_batch(self, indices: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Gather features for a batch of video indices -> (app, motion)."""
        if self._app is not None:
            return self._app[indices], self._motion[indices]
        assert self._file is not None
        # h5py fancy indexing requires strictly increasing unique indices
        uniq, inv = np.unique(np.asarray(indices), return_inverse=True)
        app = _fit_frames(self._file["app"][uniq], self.num_frames)[inv]
        mot = _fit_frames(self._file["motion"][uniq], self.num_frames)[inv]
        return app, mot

    def frame_mask(self, indices: np.ndarray) -> Optional[np.ndarray]:
        """[B, T] 1.0/0.0 validity mask, or None if the store has no
        per-video frame counts (legacy files: every frame valid)."""
        if self.frame_counts is None:
            return None
        counts = self.frame_counts[np.asarray(indices)]
        return (
            np.arange(self.num_frames)[None, :] < counts[:, None]
        ).astype(np.float32)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None


def _fit_frames(x: np.ndarray, num_frames: int) -> np.ndarray:
    """Pad (zeros) or uniformly subsample the time axis to num_frames."""
    n, t = x.shape[:2]
    if t == num_frames:
        return np.ascontiguousarray(x, dtype=np.float32)
    if t > num_frames:
        idx = np.linspace(0, t - 1, num_frames).round().astype(np.int64)
        return np.ascontiguousarray(x[:, idx], dtype=np.float32)
    out = np.zeros((n, num_frames) + x.shape[2:], np.float32)
    out[:, :t] = x
    return out


class PrefetchIterator:
    """Wrap a host batch iterator; overlap assembly/H2D with device compute.

    `put_fn` maps a host batch (pytree of numpy arrays) to device arrays —
    typically `lambda b: jax.device_put(b, sharding)`. Depth-2 queue gives
    classic double buffering; the background thread keeps one batch in
    flight while the device consumes the previous one.
    """

    def __init__(self, batches: Iterator, put_fn=None, depth: int = 2):
        self._put = put_fn or (lambda x: x)
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._worker, args=(batches,), daemon=True
        )
        self._thread.start()

    def _worker(self, batches: Iterator) -> None:
        try:
            for batch in batches:
                if self._stop.is_set():
                    return
                item = self._put(batch)
                # bounded put that stays responsive to close()
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            try:
                self._q.put_nowait(_SENTINEL)
            except queue.Full:
                pass  # consumer gone; close() drains anyway

    def close(self) -> None:
        """Stop the worker and join it. Idempotent; abandoning an iterator
        mid-epoch (the train loop pulls exactly steps_per_epoch × epochs
        batches from an infinite source) must not leak a thread per stage."""
        self._stop.set()
        while True:  # unblock a worker stuck on a full queue
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


_SENTINEL = object()
