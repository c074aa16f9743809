"""Multiprocess prefetching data loader feeding the TPU host pipeline.

Replaces torch.utils.data.DataLoader (reference
net_run_dsbn/agent_abstract.py:241-318: per-domain loaders, 16-32 workers,
seeded generators + worker_init_fn). Design:

* persistent worker processes (forkserver/spawn — fork would duplicate any
  initialized JAX/TPU client state into children) pulling item indices from
  a task queue and pushing decoded+transformed sample dicts back;
* **per-item seeding** (``seed + items_served``) of python/numpy RNG before
  each ``__getitem__`` — stronger determinism than the reference's
  per-worker seeding (results do not depend on worker count or scheduling);
* in-order collation with a bounded prefetch window (keeps volumes flowing
  while the accelerator computes);
* ``num_workers=0`` falls back to a synchronous in-process iterator with the
  identical seeding, used in tests.

Collation stacks equal-shaped arrays into a leading batch axis, turns
scalars into [N] arrays and keeps strings as lists (the transform-inverse
JSON params survive as singleton lists, like torch collation did in the
reference).
"""
from __future__ import annotations

import multiprocessing as mp
import random
from typing import Dict, Iterator, List

import numpy as np


def _seed_all(seed: int):
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))


def _worker_loop(dataset, task_q, result_q, base_seed):
    while True:
        job = task_q.get()
        if job is None:
            break
        send_idx, item_idx = job
        _seed_all(base_seed + send_idx)
        try:
            sample = dataset[item_idx]
            result_q.put((send_idx, sample, None))
        except Exception as exc:  # surface worker errors to the main process
            result_q.put((send_idx, None, repr(exc)))


def collate(samples: List[dict]) -> Dict[str, object]:
    batch: Dict[str, object] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = vals[0]
        if isinstance(first, np.ndarray):
            batch[key] = np.stack(vals, axis=0)
        elif isinstance(first, (int, float, np.integer, np.floating)):
            batch[key] = np.asarray(vals)
        else:
            batch[key] = vals   # strings (names, JSON params), tuples
    return batch


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 num_workers: int = 0, seed: int = 0, drop_last: bool = False,
                 prefetch_factor: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch_factor = max(prefetch_factor, 1)
        self._epoch = 0
        self._pool = None
        self._task_q = None
        self._result_q = None

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    # -- worker pool ------------------------------------------------------
    def _ensure_pool(self):
        if self._pool is not None:
            return
        # 'forkserver' (with 'spawn' fallback): forking a process that has
        # already initialised JAX's multithreaded runtime can deadlock the
        # child; the forkserver is spawned clean at first use.
        try:
            ctx = mp.get_context('forkserver')
        except ValueError:
            ctx = mp.get_context('spawn')
        self._task_q = ctx.Queue()
        self._result_q = ctx.Queue()
        self._pool = [ctx.Process(target=_worker_loop,
                                  args=(self.dataset, self._task_q,
                                        self._result_q, self.seed),
                                  daemon=True)
                      for _ in range(self.num_workers)]
        for p in self._pool:
            p.start()

    def shutdown(self):
        if self._pool is not None:
            for _ in self._pool:
                self._task_q.put(None)
            for p in self._pool:
                p.join(timeout=5)
                if p.is_alive():
                    p.terminate()
            self._pool = None

    def __del__(self):
        try:
            self.shutdown()
        except Exception:
            pass

    # -- iteration --------------------------------------------------------
    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rs = np.random.RandomState(self.seed + self._epoch)
            rs.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, object]]:
        indices = self._epoch_indices()
        epoch_base = self._epoch * len(self.dataset)
        self._epoch += 1
        if self.num_workers == 0:
            yield from self._iter_sync(indices, epoch_base)
        else:
            yield from self._iter_workers(indices, epoch_base)

    def _iter_sync(self, indices, epoch_base):
        buf = []
        for i, item_idx in enumerate(indices):
            _seed_all(self.seed + epoch_base + i)
            buf.append(self.dataset[int(item_idx)])
            if len(buf) == self.batch_size:
                yield collate(buf)
                buf = []
        if buf and not self.drop_last:
            yield collate(buf)

    def stream(self) -> Iterator[Dict[str, object]]:
        """Endless batch stream without epoch barriers: the index sequence
        chains reshuffled epochs, so the worker prefetch window stays full
        across epoch boundaries (a per-epoch window stalls when the dataset
        is smaller than the window). Batches always have ``batch_size``
        items (epochs wrap mid-batch), matching an endless sampler — the
        constant batch shape also keeps XLA from retracing on short final
        batches and is required by the mesh-sharded training step."""

        if len(self.dataset) == 0:
            raise ValueError('cannot stream from an empty dataset')

        def index_stream():
            while True:
                for item_idx in self._epoch_indices():
                    yield int(item_idx)
                self._epoch += 1

        idx_iter = index_stream()
        if self.num_workers == 0:   # synchronous variant, same seeding rule
            counter = 0
            buf = []
            while True:
                _seed_all(self.seed + counter)
                buf.append(self.dataset[next(idx_iter)])
                counter += 1
                if len(buf) == self.batch_size:
                    yield collate(buf)
                    buf = []

        self._ensure_pool()
        window = max(self.num_workers * self.prefetch_factor,
                     self.batch_size)
        submitted = 0
        received = {}
        next_out = 0
        buf = []
        for _ in range(window):
            self._task_q.put((submitted, next(idx_iter)))
            submitted += 1
        while True:
            while next_out not in received:
                send_idx, sample, err = self._result_q.get()
                if err is not None:
                    self.shutdown()
                    raise RuntimeError('data worker failed on item {0}: {1}'
                                       .format(send_idx, err))
                received[send_idx] = sample
            buf.append(received.pop(next_out))
            next_out += 1
            self._task_q.put((submitted, next(idx_iter)))
            submitted += 1
            if len(buf) == self.batch_size:
                yield collate(buf)
                buf = []

    def _iter_workers(self, indices, epoch_base):
        self._ensure_pool()
        n = len(indices)
        window = self.num_workers * self.prefetch_factor
        submitted = 0
        received = {}
        next_out = 0

        def submit():
            nonlocal submitted
            if submitted < n:
                self._task_q.put((epoch_base + submitted,
                                  int(indices[submitted])))
                submitted += 1

        for _ in range(min(window, n)):
            submit()

        buf = []
        while next_out < n:
            want = epoch_base + next_out
            while want not in received:
                send_idx, sample, err = self._result_q.get()
                if err is not None:
                    self.shutdown()
                    raise RuntimeError('data worker failed on item {0}: {1}'
                                       .format(send_idx, err))
                received[send_idx] = sample
            buf.append(received.pop(want))
            next_out += 1
            submit()
            if len(buf) == self.batch_size:
                yield collate(buf)
                buf = []
        if buf and not self.drop_last:
            yield collate(buf)


def repeat_loader(loader) -> Iterator:
    """Endless iterator over a loader (reference repeat_dataloader,
    agent_seg.py:150-153). DataLoaders stream without epoch barriers so
    batches keep a constant ``batch_size`` shape (no XLA retrace on short
    final batches; the mesh-sharded step requires it) and the worker
    prefetch window pipelines across epoch boundaries."""
    if isinstance(loader, DataLoader):
        yield from loader.stream()
    else:
        while True:
            for batch in loader:
                yield batch


def prefetch_iter(iterable, depth: int = 2):
    """Thread-backed look-ahead over any iterable: item i+1's production
    (NIfTI decode, transform chain — gzip/numpy release the GIL) overlaps
    the consumer's work on item i. Used by the agent's test stage so host
    decode hides under device inference; errors re-raise at the consumer."""
    import queue as _queue
    import threading as _threading

    q: '_queue.Queue' = _queue.Queue(maxsize=max(depth, 1))
    sentinel = object()
    failure = []
    stop = _threading.Event()

    def _put_until_stop(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except _queue.Full:
                continue
        return False   # consumer abandoned the generator

    def _producer():
        try:
            for item in iterable:
                if not _put_until_stop(item):
                    return
        except BaseException as exc:   # surface to the consumer
            failure.append(exc)
        _put_until_stop(sentinel)

    thread = _threading.Thread(target=_producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if failure:
                    raise failure[0]
                return
            yield item
    finally:
        # consumer raised or abandoned the generator: release the producer
        # (it may be blocked in put holding decoded volumes) and drain
        stop.set()
        try:
            while True:
                q.get_nowait()
        except _queue.Empty:
            pass
