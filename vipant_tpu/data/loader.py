"""Threaded, prefetching data loader.

The reference fed the GPU from ``torch.utils.data.DataLoader`` worker
*processes* (`/root/reference/cvap/data/image_audio.py:366-374`); here the
decode+fbank item path runs in a thread pool (NumPy/C++ released-GIL work),
batches are assembled by a collator, and a bounded queue keeps ``prefetch``
batches ready so the accelerator never waits on the host (SURVEY.md §7
hard-part 6). ``device_put_fn`` lets the trainer overlap H2D transfer with
compute (double buffering).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator, List, Optional, Sequence

import numpy as np

from .indexfile import epoch_permutation


class DataLoader:
    def __init__(
        self,
        dataset,  # indexable: __len__, __getitem__
        batch_size: int,
        collate_fn: Callable[[List[Any]], Any],
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        device_put_fn: Optional[Callable[[Any], Any]] = None,
        sample_weights: Optional[np.ndarray] = None,
        pad_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.prefetch = max(prefetch, 1)
        self.seed = seed
        self.device_put_fn = device_put_fn
        self.sample_weights = sample_weights
        # pad the final partial batch (repeating its last item) so every
        # batch has a fixed shape — one jit compile instead of one per
        # remainder size; dict batches carry the true count under "_count"
        self.pad_last = pad_last
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.sample_weights is not None:
            # weighted sampling with replacement (the WeightedRandomSampler
            # analogue, `/root/reference/cvap/data/audioset_clf.py:154-194`)
            rng = np.random.default_rng(self.seed + self.epoch)
            w = self.sample_weights / self.sample_weights.sum()
            return rng.choice(n, size=n, replace=True, p=w)
        if self.shuffle:
            return epoch_permutation(n, self.epoch, self.seed)
        return np.arange(n)

    def __iter__(self) -> Iterator[Any]:
        order = self._order()
        nb = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def safe_put(item) -> bool:
            """put that re-checks stop so an abandoned consumer (early break,
            exception) never leaves this thread parked on a full queue."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # two-stage pipeline: item decode/collate (CPU) runs ahead while
            # a dedicated transfer thread owns device_put — H2D waits (which
            # can be long when transfers serialize behind an executing step)
            # overlap with building the next batch instead of stalling it
            from collections import deque

            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool, \
                        ThreadPoolExecutor(max_workers=1) as xfer:
                    pending: deque = deque()

                    def drain(limit: int) -> bool:
                        while len(pending) > limit:
                            if not safe_put(pending.popleft().result()):
                                return False
                        return True

                    for idxs in batches:
                        if stop.is_set():
                            return
                        true_count = len(idxs)
                        if self.pad_last and true_count < self.batch_size:
                            idxs = np.concatenate(
                                [idxs, np.repeat(idxs[-1:], self.batch_size - true_count)]
                            )
                        items = list(pool.map(self.dataset.__getitem__, idxs))
                        batch = self.collate_fn(items)
                        if self.pad_last and isinstance(batch, dict):
                            batch["_count"] = true_count
                        if self.device_put_fn is not None:
                            pending.append(xfer.submit(self.device_put_fn, batch))
                            if not drain(1):
                                return
                        elif not safe_put(batch):
                            return
                    if not drain(0):
                        return
            except Exception as e:  # surface worker errors to the consumer
                safe_put(e)
            finally:
                safe_put(StopIteration)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is StopIteration:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
