"""Batching data loader with worker-parallel decode and device prefetch.

TPU-native replacement for the reference's PyTorch DataLoader (SURVEY.md §3
C9/C10, §4.4): host workers only DECODE (PNG -> numpy); batches are
asynchronously pushed to the device (optionally with a data-parallel
NamedSharding so each host batch lands pre-sharded over the mesh), and all
geometric/numeric preprocessing (normalize, resize, GT scaling) runs as
jitted device code (`make_preprocess_fn`).

Threads rather than processes: the decode hot path (cv2 PNG inflate) releases
the GIL, and thread workers avoid the fork/pickle overhead the reference
pays for process workers.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from cerberusnet_tpu.data import encodings


def pad_batch(batch: dict, target_bs: int):
    """Pad a (possibly partial) batch to ``target_bs`` samples by repeating
    the last sample; returns (padded_batch, sample_mask) where sample_mask is
    (target_bs,) float32 with 1.0 for real samples and 0.0 for padding.

    Eval loops use this with drop_last=False so the final partial batch keeps
    its compile shape while padded samples are excluded from metrics via the
    mask (VERDICT r1 W5: evaluate() silently dropped the eval tail).
    """
    n = len(next(iter(batch.values())))
    if n > target_bs:
        raise ValueError(f"batch of {n} exceeds target {target_bs}")
    mask = np.zeros((target_bs,), np.float32)
    mask[:n] = 1.0
    if n == target_bs:
        return batch, mask
    pad = target_bs - n
    out = {
        k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
        for k, v in batch.items()
    }
    return out, mask


def collate(samples):
    """Stack a list of sample dicts into one batch dict (shared keys only)."""
    keys = set(samples[0])
    for s in samples[1:]:
        keys &= set(s)
    return {k: np.stack([s[k] for s in samples]) for k in sorted(keys)}


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 4,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        sharding=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.sharding = sharding
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(idx)
        nb = len(self)
        for i in range(nb):
            yield idx[i * self.batch_size : (i + 1) * self.batch_size]

    def __iter__(self):
        self._epoch += 1
        pool = ThreadPoolExecutor(self.num_workers)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                for batch_idx in self._batch_indices():
                    if stop.is_set():
                        break
                    samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                    batch = collate(samples)
                    if self.sharding is not None:
                        batch = jax.device_put(batch, self.sharding)
                    out_q.put(batch)
            finally:
                out_q.put(None)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # drain so the producer can finish
            while producer.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    producer.join(timeout=0.1)
            pool.shutdown(wait=False)


def make_preprocess_fn(out_hw=None, dtype=jnp.float32):
    """Jitted device preprocessing: uint8 images -> normalized float NHWC,
    GT resized with correct value scaling (SURVEY.md §9.5)."""

    @jax.jit
    def preprocess(batch):
        out = {}
        hw = out_hw or batch["left"].shape[1:3]
        for k in ("left", "right", "temporal"):
            if k in batch:
                out[k] = encodings.preprocess_image(batch[k], tuple(hw)).astype(dtype)
        if "seg_labels" in batch:
            out["seg_labels"] = encodings.resize_labels(
                batch["seg_labels"].astype(jnp.int32), tuple(hw)
            )
        if "flow_gt" in batch:
            valid = batch.get(
                "flow_valid", jnp.ones(batch["flow_gt"].shape[:3], jnp.float32)
            )
            out["flow_gt"], out["flow_valid"] = encodings.resize_flow(
                batch["flow_gt"], valid, tuple(hw)
            )
        if "disp_gt" in batch:
            valid = batch.get(
                "disp_valid", (batch["disp_gt"] > 0).astype(jnp.float32)
            )
            out["disp_gt"], out["disp_valid"] = encodings.resize_disparity(
                batch["disp_gt"], valid, tuple(hw)
            )
        return out

    return preprocess
