"""Batched data loading with background prefetch.

Replaces detectron2's build_detection_{train,test}_loader
(train_NopeSAC.py:73-85): pairs are mapped to fixed-shape numpy samples
either in the producer thread (num_workers=0) or in a spawn-based
multiprocessing pool (num_workers>0, the DATALOADER.NUM_WORKERS semantics
of the reference Base.yaml:30 - PIL decode + RLE + mask rasterisation are
GIL-bound, so real hosts want processes). Collated batches are prefetched
through a bounded queue. Multi-host: each process takes a strided shard of
the dataset (index % num_shards == shard_id), like d2's per-rank sampler.

Pool transport (round 5): mapped samples are ~10 MB of fixed-shape arrays
each (two f32 images + bit-packed masks); returning them through the pool's
pickle pipe made 4 workers 5x SLOWER than serial (BENCH_r04:
9.8 vs 52 pairs/s — every byte was pickled, piped and unpickled). Workers
now write arrays straight into a pre-allocated SharedMemory slab ring (one
slot per batch index, zero-copy for the consumer, which views the slab while
collate stacks) and return only a tiny (slot, descriptor, small-objects)
tuple. The pool uses the spawn context: fork from the (jax-)multithreaded
parent risks deadlock on inherited locks and warns on 3.12+.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional

import numpy as np

from .mapper import collate

# pool worker state, set once by the initializer (spawn: shipped pickled)
_WORKER_MAPPER = None
_WORKER_DATASET = None
_WORKER_SHM = None
_WORKER_SLOT_BYTES = 0

# arrays at or above this size travel via shared memory; smaller values
# (scalars, tiny vectors, meta dicts) ride the regular result pickle
_SHM_MIN_BYTES = 4096


def _init_worker(mapper, dataset, shm_name, slot_bytes):
    global _WORKER_MAPPER, _WORKER_DATASET, _WORKER_SHM, _WORKER_SLOT_BYTES
    _WORKER_MAPPER = mapper
    _WORKER_DATASET = dataset
    _WORKER_SLOT_BYTES = slot_bytes
    if shm_name is not None:
        from multiprocessing import shared_memory

        # attach-time registration with the (inherited, shared) resource
        # tracker is idempotent — the tracker cache is a set — and the
        # parent's unlink unregisters exactly once, so no unregister hack
        _WORKER_SHM = shared_memory.SharedMemory(name=shm_name)


def _flatten_sample(sample):
    """-> [(path, value)] with path = (key,) or (key, subkey)."""
    out = []
    for k, v in sample.items():
        if isinstance(v, dict) and k != "meta":
            for sk, sv in v.items():
                out.append(((k, sk), sv))
        else:
            out.append(((k,), v))
    return out


def _map_item(args):
    # (dataset index, seed, slot): the pair dict itself never crosses the
    # pipe — real datasets' pair dicts are small (paths), but synthetic /
    # obs-pickle datasets embed MB-scale depth maps per entry
    idx, seed, slot = args
    sample = _WORKER_MAPPER(_WORKER_DATASET[idx], aug_seed=seed)
    if _WORKER_SHM is None:
        return sample
    base = slot * _WORKER_SLOT_BYTES
    off = 0
    descrs = []
    small = []
    for path, v in _flatten_sample(sample):
        if (isinstance(v, np.ndarray) and v.nbytes >= _SHM_MIN_BYTES
                and v.dtype != object):
            nbytes = int(v.nbytes)
            if off + nbytes > _WORKER_SLOT_BYTES:
                raise ValueError(
                    f"shm slot overflow at {path}: need {off + nbytes} > "
                    f"slot {_WORKER_SLOT_BYTES} bytes (sample shapes grew "
                    "beyond the construction-time probe)")
            dst = np.ndarray(v.shape, v.dtype, buffer=_WORKER_SHM.buf,
                             offset=base + off)
            np.copyto(dst, v)
            descrs.append((path, v.shape, v.dtype.str, off))
            off += nbytes
        else:
            small.append((path, v))
    return (slot, descrs, small)


class _LoaderClosed(Exception):
    """Producer-side signal: the loader was close()d mid-epoch."""


class _ProducerError:
    """Queue envelope for an exception raised in the producer thread."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class PairLoader:
    def __init__(
        self,
        dataset: List[dict],
        mapper: Callable,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 42,
        num_shards: int = 1,
        shard_id: int = 0,
        prefetch: int = 2,
        infinite: bool = False,
        num_workers: int = 0,
    ):
        self.dataset = dataset[shard_id::num_shards] if num_shards > 1 else dataset
        self.mapper = mapper
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.infinite = infinite
        self.num_workers = num_workers
        self._pool = None
        self._shm = None
        self._slot_bytes = 0
        self._closing = False  # close() racing a live producer thread
        self._item_counter = 0  # monotone per-sample augmentation seed base
        if num_workers > 0 and len(self.dataset):
            import multiprocessing as mp
            from multiprocessing import shared_memory

            # size the slab from one probed sample: fixed-shape design means
            # every mapped sample has identical array footprint; 25% + 64 KiB
            # headroom absorbs small metadata-driven variation, and workers
            # raise (not corrupt) on overflow
            probe = mapper(self.dataset[0], aug_seed=self.seed * 1_000_003 - 1)
            arr_bytes = sum(
                int(v.nbytes) for _, v in _flatten_sample(probe)
                if isinstance(v, np.ndarray) and v.nbytes >= _SHM_MIN_BYTES
                and v.dtype != object)
            self._slot_bytes = -(-(int(arr_bytes * 1.25) + 65536) // 4096) * 4096
            # 2x batch_size slots: the producer double-buffers (workers map
            # chunk b+1 while the parent collates chunk b), so two chunks'
            # slots are live at once, on alternating parities
            self._shm = shared_memory.SharedMemory(
                create=True, size=max(1, self._slot_bytes * batch_size * 2))
            # spawn (not fork): the parent is jax-multithreaded by the time
            # loaders exist, and fork() under threads both warns on 3.12+
            # and can deadlock children on inherited locks. The mapper is
            # pickled once into each worker via the initializer.
            self._pool = mp.get_context("spawn").Pool(
                num_workers, initializer=_init_worker,
                initargs=(mapper, self.dataset, self._shm.name,
                          self._slot_bytes))

    def _collate_pooled(self, rets) -> Optional[dict]:
        """Batch assembly straight from the slab ring: every sample shares
        one fixed descriptor layout (fixed-shape design), so each array key
        is ONE strided view over the slots + ONE bulk contiguous copy —
        measured 116 ms/batch of per-sample np.stack collate down to the
        raw memcpy. Returns None when the layout assumption does not hold
        (caller falls back to per-sample rebuild + collate)."""
        slot0, descrs0, _ = rets[0]
        if any(d[1:] != d0[1:] for r in rets[1:] for d, d0 in zip(r[1], descrs0)) \
                or any(len(r[1]) != len(descrs0) for r in rets):
            return None
        # slots of one chunk are contiguous ascending (parity*B + i)
        slots = [r[0] for r in rets]
        if slots != list(range(slot0, slot0 + len(rets))):
            return None
        out: dict = {}

        def put(path, v):
            if len(path) == 1:
                out[path[0]] = v
            else:
                out.setdefault(path[0], {})[path[1]] = v

        n = len(rets)
        base = slot0 * self._slot_bytes
        for path, shape, dtype, off in descrs0:
            dt = np.dtype(dtype)
            shape = tuple(shape)
            strides = [dt.itemsize]
            for s in reversed(shape[1:]):
                strides.insert(0, strides[0] * s)
            view = np.ndarray((n,) + shape, dt, buffer=self._shm.buf,
                              offset=base + off,
                              strides=(self._slot_bytes,) + tuple(strides))
            # .copy(), NOT ascontiguousarray: a size-1 leading dim counts as
            # contiguous, so ascontiguousarray would hand the caller a LIVE
            # slab view that segfaults once the ring is reused or unlinked
            put(path, view.copy())
        # small values (meta, sub-4KiB arrays): per-sample python objects
        out["meta"] = []
        small_arrays: dict = {}
        for _, _, small in rets:
            for path, v in small:
                if path == ("meta",):
                    out["meta"].append(v)
                else:
                    small_arrays.setdefault(path, []).append(v)
        for path, vals in small_arrays.items():
            put(path, np.stack(vals))
        return out

    def _rebuild(self, ret) -> dict:
        """(slot, descrs, small) -> sample dict with zero-copy slab views."""
        slot, descrs, small = ret
        sample: dict = {}

        def put(path, v):
            if len(path) == 1:
                sample[path[0]] = v
            else:
                sample.setdefault(path[0], {})[path[1]] = v

        for path, v in small:
            put(path, v)
        base = slot * self._slot_bytes
        for path, shape, dtype, off in descrs:
            put(path, np.ndarray(shape, np.dtype(dtype),
                                 buffer=self._shm.buf, offset=base + off))
        return sample

    def _start_chunk(self, chunk, parity: int):
        """Dispatch a chunk. Pool path: non-blocking map_async writing into
        the `parity` half of the slot ring; inline path: maps immediately."""
        # explicit per-sample seeds: deterministic given (loader seed, item
        # order), identical semantics in both the pool and in-line paths
        seeds = [self.seed * 1_000_003 + self._item_counter + k
                 for k in range(len(chunk))]
        self._item_counter += len(chunk)
        pool = self._pool
        if pool is None:
            return [self.mapper(self.dataset[i], aug_seed=s)
                    for i, s in zip(chunk, seeds)]
        base = parity * self.batch_size
        try:
            return pool.map_async(_map_item, list(zip(
                (int(i) for i in chunk), seeds,
                range(base, base + len(chunk)))))
        except ValueError:
            # close() terminated the pool under a producer thread mid-epoch
            # ("Pool not running"); surface as a clean stop instead of an
            # unraisable thread exception
            if self._closing or self._pool is None:
                raise _LoaderClosed()
            raise

    def _finish_chunk(self, started) -> list:
        """Counterpart of _start_chunk: resolve to a list of samples (slab
        views for the pool path — the caller must collate/copy them before
        this parity's slots are dispatched again)."""
        if isinstance(started, list):
            return started
        try:
            rets = started.get()
        except ValueError:
            if self._closing or self._pool is None:
                raise _LoaderClosed()
            raise
        return [self._rebuild(r) for r in rets]

    def _finish_batch(self, started) -> dict:
        """_finish_chunk + collate, with the pooled fast path (strided bulk
        copies out of the slab) when the fixed-layout assumption holds."""
        if isinstance(started, list):
            return collate(started)
        try:
            rets = started.get()
        except ValueError:
            if self._closing or self._pool is None:
                raise _LoaderClosed()
            raise
        batch = self._collate_pooled(rets)
        if batch is not None:
            return batch
        return collate([self._rebuild(r) for r in rets])

    def _map_chunk(self, chunk) -> list:
        """Synchronous convenience (tests / external callers)."""
        return self._finish_chunk(self._start_chunk(chunk, 0))

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(idx)
        return idx

    def _produce(self, q: "queue.Queue", stop: threading.Event):
        try:
            self._produce_inner(q, stop)
        except Exception as e:  # surface to the consumer, don't hang it
            # a mapper/worker exception used to kill this thread silently,
            # leaving the consumer blocked in q.get() FOREVER (observed with
            # a dataset-kind/mapper mismatch); ship the exception through
            # the queue so __iter__ re-raises it in the consumer thread
            while not stop.is_set():
                try:
                    q.put(_ProducerError(e), timeout=0.5)
                    return
                except queue.Full:
                    continue

    def _produce_inner(self, q: "queue.Queue", stop: threading.Event):
        def _put(batch) -> bool:
            # bounded put that honours stop: a consumer that abandons
            # the iterator (e.g. train() breaking at max_iter) would
            # otherwise leave this thread blocked in q.put forever,
            # pinning prefetch+1 collated batches
            while not stop.is_set():
                try:
                    q.put(batch, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        epoch = 0
        while not stop.is_set():
            idx = self._epoch_indices(epoch)
            nb = len(self)
            # double-buffered: chunk b+1 maps in the workers while this
            # thread rebuilds/collates chunk b out of the other slot parity
            pending = None
            for b in range(nb):
                if stop.is_set():
                    return
                lo = b * self.batch_size
                chunk = idx[lo: lo + self.batch_size]
                if len(chunk) < self.batch_size and self.drop_last:
                    break
                try:
                    started = self._start_chunk(chunk, b % 2)
                    if pending is not None:
                        if not _put(self._finish_batch(pending)):
                            return
                    pending = started
                except _LoaderClosed:
                    return
            if pending is not None:
                try:
                    batch = self._finish_batch(pending)
                except _LoaderClosed:
                    return
                if not _put(batch):
                    return
            if not self.infinite:
                while not stop.is_set():
                    try:
                        q.put(None, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                return
            epoch += 1

    def __iter__(self) -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        t = threading.Thread(target=self._produce, args=(q, stop), daemon=True)
        if not hasattr(self, "_producers"):
            self._producers = []
        self._producers.append((t, stop))
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, _ProducerError):
                    raise RuntimeError(
                        "data loader producer failed") from batch.exc
                yield batch
        finally:
            stop.set()

    def close(self):
        self._closing = True
        # Shutdown order matters: (1) signal producers, (2) terminate the
        # pool — this also unblocks a producer parked in map_async.get()
        # with a "Pool not running" error it handles as _LoaderClosed —
        # (3) join producers, (4) only then unlink the slab. A thread still
        # mid-copy over the shm buffer at unlink time would segfault on the
        # unmapped pages (bounded join — the threads are daemons).
        for t, stop in getattr(self, "_producers", []):
            stop.set()
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None
        for t, stop in getattr(self, "_producers", []):
            t.join(timeout=2.0)
        self._producers = []
        if self._shm is not None:
            try:
                self._shm.close()
                self._shm.unlink()
            except Exception:
                pass
            self._shm = None

    def __del__(self):
        self.close()
