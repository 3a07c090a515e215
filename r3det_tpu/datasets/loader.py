"""Batch loader: dataset + pipeline -> fixed-shape device-ready batches.

Replaces the reference's torch DataLoader workers (SURVEY.md §2.8's host
CPU parallelism) with a thread-prefetched numpy loader. Fixed output
shapes by construction: every batch is {'image': (B, H, W, 3) f32,
'gt_bboxes': (B, G, 5), 'gt_labels': (B, G) i32, 'gt_mask': (B, G) bool}.
Samples rejected by the pipeline (PolyRandomRotate killing all gt) are
resampled, mirroring mmdet's None-filtering collate.
"""
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class DetLoader:
    """``batch_size`` is the PER-PROCESS batch. Multi-host training sets
    ``process_index``/``process_count`` (tools/train.py passes
    jax.process_index()/process_count()): every process draws the same
    seeded epoch permutation and takes its own stride of it — the
    reference's DistributedSampler semantics (SURVEY.md §2.8) — so the
    union over hosts covers the epoch with no duplicates. The local
    batches then assemble into one global jax.Array via
    parallel.mesh.shard_batch (jax.make_array_from_process_local_data).
    """

    def __init__(self, dataset, pipeline, batch_size=2, shuffle=True,
                 seed=0, prefetch=2, drop_last=True, num_workers=4,
                 process_index=0, process_count=1):
        self.dataset = dataset
        self.pipeline = pipeline
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch
        self.drop_last = drop_last
        # threads, not processes: cv2 decode/warp release the GIL
        self.num_workers = max(1, num_workers)
        assert 0 <= process_index < process_count
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self):
        n = len(self.dataset) // self.process_count \
            if self.process_count > 1 else len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def _sample(self, idx):
        for attempt in range(10):
            out = self.pipeline(self.dataset.get_sample(idx))
            if out is not None:
                return out
            idx = self.rng.randint(len(self.dataset))
        raise RuntimeError('pipeline rejected 10 consecutive samples')

    def _epoch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            # same permutation on every process (seeded identically) ->
            # the per-process strides partition the epoch exactly
            self.rng.shuffle(idx)
        if self.process_count > 1:
            idx = idx[self.process_index::self.process_count]
        return idx

    def _collate(self, samples):
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def _put(item):
            # poll so the thread exits promptly if the consumer abandons
            # the iterator (avoids a blocked thread at interpreter exit)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            idx = self._epoch_indices()
            nb = len(self)
            for b in range(nb):
                if stop.is_set():
                    return
                chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
                if len(chunk) < self.batch_size and self.drop_last:
                    break
                samples = list(pool.map(self._sample, chunk))
                if not _put(self._collate(samples)):
                    return
            _put(sentinel)

        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False)


class SyntheticDetData:
    """Infinite synthetic DOTA-like batches for smoke tests/benchmarks."""

    def __init__(self, batch_size=2, size=1024, max_gt=64, num_classes=15,
                 version='v1', seed=0):
        self.batch_size = batch_size
        self.size = size
        self.max_gt = max_gt
        self.num_classes = num_classes
        self.version = version
        self.rng = np.random.RandomState(seed)

    def batch(self):
        import math
        b, g, s = self.batch_size, self.max_gt, self.size
        images = self.rng.normal(0, 1, (b, s, s, 3)).astype(np.float32)
        boxes = np.zeros((b, g, 5), np.float32)
        labels = np.zeros((b, g), np.int32)
        mask = np.zeros((b, g), bool)
        for i in range(b):
            n = self.rng.randint(4, min(g, 32) + 1)
            boxes[i, :n] = np.stack([
                self.rng.uniform(50, s - 50, n),
                self.rng.uniform(50, s - 50, n),
                self.rng.uniform(16, 120, n),
                self.rng.uniform(12, 80, n),
                self.rng.uniform(-math.pi / 2 + 0.05, -0.05, n)], -1)
            labels[i, :n] = self.rng.randint(0, self.num_classes, n)
            mask[i, :n] = True
        return {'image': images, 'gt_bboxes': boxes, 'gt_labels': labels,
                'gt_mask': mask}

    def __iter__(self):
        while True:
            yield self.batch()
