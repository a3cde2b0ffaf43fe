"""Parallel data loading + device prefetch.

Replaces torch DataLoader + DistributedSampler + pin_memory H2D
(``main_lavila_pretrain.py:582-592``): worker processes run the
dataset's fused-decode ``__getitem__``; the main process collates and
asynchronously ships batches to the mesh with ``device_put`` so the
next batch is in flight while the TPU computes (double-buffering).
Per-host sharding for multi-host meshes mirrors DistributedSampler's
rank slicing via ``make_global_batch``.
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np

from avion_tpu.data.datasets import collate

_WORKER_DATASET = None

# arrays at least this large travel via POSIX shared memory instead of
# the executor's pickle pipe (frame batches are ~100s of MB; pickling
# them costs two extra memcpys, one of them in the MAIN process — the
# serialization point when many workers feed one trainer).  torch's
# DataLoader does the same via its shared-memory tensor allocator.
_SHM_MIN_BYTES = 1 << 20


def _worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_fetch(indices):
    items = [_WORKER_DATASET[int(i)] for i in indices]
    return collate(items)


def _shm_export(batch):
    """Move large arrays of a collated batch into shared-memory
    segments; returns a descriptor dict safe to pickle.  Falls back to
    plain arrays per-field if /dev/shm is unavailable/full."""
    from multiprocessing import shared_memory

    out = {}
    for k, v in batch.items():
        if not (isinstance(v, np.ndarray) and v.nbytes >= _SHM_MIN_BYTES):
            out[k] = v
            continue
        try:
            shm = shared_memory.SharedMemory(create=True, size=v.nbytes)
        except OSError:
            out[k] = v
            continue
        np.ndarray(v.shape, v.dtype, buffer=shm.buf)[...] = v
        # the MAIN process owns the segment's lifetime (it unlinks on
        # attach); stop this worker's resource_tracker from warning
        # about it / unlinking it at worker exit
        try:
            from multiprocessing import resource_tracker

            resource_tracker.unregister(shm._name, "shared_memory")
        except Exception:
            pass
        out[k] = ("__shm__", shm.name, v.shape, str(v.dtype))
        shm.close()
    return out


def _worker_fetch_shm(indices):
    return _shm_export(_worker_fetch(indices))


def _shm_attach(batch):
    """Rebuild arrays from shm descriptors ZERO-COPY.  The segment is
    unlinked immediately (POSIX keeps it alive while mapped, so a crash
    can never leak /dev/shm entries) and unmapped when the array is
    garbage collected."""
    import weakref
    from multiprocessing import shared_memory

    out = {}
    for k, v in batch.items():
        if not (isinstance(v, tuple) and len(v) == 4 and v[0] == "__shm__"):
            out[k] = v
            continue
        shm = shared_memory.SharedMemory(name=v[1])
        arr = np.ndarray(v[2], np.dtype(v[3]), buffer=shm.buf)
        try:
            shm.unlink()
        except FileNotFoundError:
            pass
        weakref.finalize(arr, shm.close)
        out[k] = arr
    return out


class DataLoader:
    """Map-style loader: shuffling sampler, worker pool, prefetch queue.

    num_workers=0 -> synchronous in-process loading (debuggable);
    otherwise a fork-based process pool decodes batches ahead of time.

    ``batch_size`` is GLOBAL: under multi-host jax each process yields
    ``batch_size // process_count`` rows from a disjoint slice of the
    (identically-seeded) permutation, and ``make_global_batch`` glues
    the host shards into the global batch — DistributedSampler
    semantics (``avion/utils/distributed.py:75-97`` + the reference's
    per-rank sampler at ``main_lavila_pretrain.py:557-573``).
    Sharding activates when ``shard_across_hosts`` (default: only for
    shuffling/training loaders — eval loaders iterate the full set on
    every host and slice local rows at device-put time instead).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch_depth: int = 4,
        seed: int = 0,
        epoch: int = 0,
        infinite: bool = False,
        skip_batches: int = 0,
        use_shm: bool = True,
        shard_across_hosts: Optional[bool] = None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        if process_count is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.process_index = process_index
        self.process_count = process_count
        if shard_across_hosts is None:
            shard_across_hosts = shuffle
        self.shard_across_hosts = shard_across_hosts and process_count > 1
        if self.shard_across_hosts:
            assert batch_size % process_count == 0, (batch_size, process_count)
        self.dataset = dataset
        self.batch_size = batch_size  # global
        self.local_batch = (batch_size // process_count
                            if self.shard_across_hosts else batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch_depth = max(1, prefetch_depth)
        self.seed = seed
        self.epoch = epoch
        self.infinite = infinite
        # debug: skip the first N batches of the first epoch
        # (--skip-to-batch, main_lavila_pretrain.py:217-228)
        self.skip_batches = skip_batches
        self.use_shm = use_shm
        self._pool = None

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _host_order(self, epoch: int) -> np.ndarray:
        """This host's index slice: same-seed permutation on every host,
        pad/trim to a multiple of process_count, interleaved slice."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        if not self.shard_across_hosts:
            return order
        world = self.process_count
        if self.drop_last:
            total = (n // world) * world
            order = order[:total]
        else:
            total = -(-n // world) * world
            order = np.concatenate([order, order[: total - n]])
        return order[self.process_index::world]

    def __len__(self):
        n = len(self.dataset)
        if self.shard_across_hosts:
            world = self.process_count
            n = (n // world) if self.drop_last else -(-n // world)
        b = self.local_batch
        return n // b if self.drop_last else -(-n // b)

    def _index_batches(self, epoch: int):
        order = self._host_order(epoch)
        n = len(order)
        b = self.local_batch
        stop = (n // b) * b if self.drop_last else n
        start = self.skip_batches * b if epoch == self.epoch else 0
        self.skip_batches = 0
        for i in range(start, stop, b):
            yield order[i : i + b]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        epoch = self.epoch
        while True:
            if self.num_workers <= 0:
                for idx in self._index_batches(epoch):
                    yield collate([self.dataset[int(i)] for i in idx])
            else:
                if self._pool is None:
                    # forkserver: workers never inherit JAX's thread pool
                    # (fork after XLA init can deadlock); the dataset is
                    # pickled once into each worker.
                    import multiprocessing as mp

                    self._pool = ProcessPoolExecutor(
                        max_workers=self.num_workers,
                        mp_context=mp.get_context("forkserver"),
                        initializer=_worker_init,
                        initargs=(self.dataset,),
                    )
                fetch = _worker_fetch_shm if self.use_shm else _worker_fetch
                pending = collections.deque()
                gen = self._index_batches(epoch)
                try:
                    for _ in range(self.prefetch_depth):
                        idx = next(gen, None)
                        if idx is None:
                            break
                        pending.append(self._pool.submit(fetch, idx))
                    while pending:
                        batch = pending.popleft().result()
                        if self.use_shm:
                            batch = _shm_attach(batch)
                        idx = next(gen, None)
                        if idx is not None:
                            pending.append(self._pool.submit(fetch, idx))
                        yield batch
                except GeneratorExit:
                    # completed futures may hold shm descriptors whose
                    # segments only WE can reclaim (workers unregistered
                    # them from their resource_tracker): attach + drop so
                    # the unlink-on-attach path frees them; a plain
                    # cancel() would leak /dev/shm (= host RAM) on every
                    # early iterator exit
                    for f in pending:
                        if f.cancel():
                            continue
                        try:
                            b = f.result(timeout=120)
                            if self.use_shm:
                                _shm_attach(b)
                        except Exception:
                            pass
                    raise
            if not self.infinite:
                return
            epoch += 1

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None


def echo_batches(it: Iterator[Any], factor: int) -> Iterator[Any]:
    """Data echoing (arXiv:1907.05550): yield each upstream batch
    ``factor`` times consecutively.

    Applied AFTER ``device_prefetch`` the repeats are the same
    on-device arrays — no extra decode, no extra H2D — so a
    decode-bound host multiplies its duty cycle by up to ``factor``.
    Per-repeat variation comes from state.step-folded step RNG where
    the step draws on-device randomness: CLIP's patch dropout / model
    dropout, and VideoMAE's tube mask via
    ``make_videomae_train_step(regen_mask=True)`` (the videomae entry
    sets it whenever echoing — a host-shipped mask would repeat).
    The pixels and contrastive negatives within a batch do repeat,
    which is the technique's documented trade.  The reference has no
    equivalent lever."""
    if factor <= 1:
        yield from it
        return
    for b in it:
        for _ in range(factor):
            yield b


def device_prefetch(
    loader: Iterator[Dict[str, np.ndarray]],
    mesh,
    depth: int = 2,
    transform: Optional[Callable] = None,
    batch_dim: int = 0,
    threaded: bool = True,
) -> Iterator[Any]:
    """Ship host batches to the mesh ahead of consumption.

    With ``threaded=True`` (default) a daemon thread runs collate ->
    ``device_put`` into a bounded queue, so the train loop NEVER blocks
    on H2D: on backends where ``device_put`` waits for the transfer (or
    serializes behind queued compute — the remote-tunnel backend does
    both), the wait lands in the prefetch thread and overlaps device
    compute — the duty-cycle mechanism the reference approximates with
    pinned-memory prefetch (``main_lavila_pretrain.py:186-191``).  It
    also keeps starvation accounting honest: time in ``next()`` is
    genuine input starvation (empty queue), not transfer dispatch.

    ``threaded=False`` keeps the synchronous generator (relies on
    ``device_put`` being async; useful for debugging).

    ``batch_dim=1``: batches arrive microbatch-major ``[M, B/M, ...]``
    (after ``transform``) and shard dim 1 (cached grad accumulation).
    """
    from avion_tpu.parallel.sharding import make_global_batch

    it = iter(loader)
    if not threaded:
        buf = collections.deque()
        try:
            while True:
                while len(buf) < depth:
                    host = next(it)
                    if transform is not None:
                        host = transform(host)
                    buf.append(
                        make_global_batch(mesh, host, batch_dim=batch_dim))
                yield buf.popleft()
        except StopIteration:
            while buf:
                yield buf.popleft()
        return

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()
    _END = object()

    def _produce():
        try:
            for host in it:
                if transform is not None:
                    host = transform(host)
                item = (make_global_batch(mesh, host, batch_dim=batch_dim),
                        None)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # re-raised in the consumer
            item = (None, e)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return
                except queue.Full:
                    continue
            return
        while not stop.is_set():
            try:
                q.put((_END, None), timeout=0.5)
                return
            except queue.Full:
                continue

    t = threading.Thread(target=_produce, daemon=True,
                         name="device_prefetch")
    t.start()
    try:
        while True:
            batch, err = q.get()
            if err is not None:
                raise err
            if batch is _END:
                return
            yield batch
    finally:
        stop.set()
        t.join(timeout=10.0)
        if not t.is_alive():
            # run the source generator's cleanup (shm reclamation in
            # DataLoader.__iter__) now that no thread is executing it
            close = getattr(it, "close", None)
            if close is not None:
                try:
                    close()
                except Exception:
                    pass
