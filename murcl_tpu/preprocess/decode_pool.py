"""Process-based patch decode pool for feature extraction.

The thread producer in :mod:`murcl_tpu.preprocess.extract` is enough to
overlap decode with device encode, but its scaling is GIL-bound: PIL's
decode/resize release the GIL only partially, so ``num_workers`` threads
on a multi-core host saturate well below ``num_workers`` cores (measured:
``scripts/bench_decode.py``). Real deployments need ~tens of decode cores
to feed one v5e chip (17,343 patches/sec chip rate vs ~200-400 patches/sec
per staging core — BASELINE.md), so the decode path must scale with
PROCESSES, not threads.

Design: a persistent ``ProcessPoolExecutor`` (spawn context — forking a
process that holds a live TPU client is unsafe) whose workers write
decoded patches straight into a ``SharedMemory`` block, so patch pixels
cross the process boundary exactly once (the parent's single copy out of
shm); tasks are row-range chunks of one slide's coord list, and each
worker caches opened slides per path so OpenSlide handles are reused
across chunks. Replaces the reference's single-threaded batch-1 hot loop
(``wsi_processing/extract_features.py:80-91``).

Opt-in via ``extract_features(..., decode_pool='process')`` /
``--decode_pool process`` — the thread producer stays the default (on a
1-vCPU host, process workers only add spawn+IPC overhead).
"""

from __future__ import annotations

import os
from multiprocessing import get_context
from multiprocessing.shared_memory import SharedMemory
from typing import List, Optional

import numpy as np

# per-worker-process slide-handle cache (path -> slide)
_SLIDES: dict = {}


def _worker_init() -> None:
    # decode workers never touch the accelerator; pin any transitive jax
    # import to the CPU backend so a spawned child cannot probe the TPU
    # tunnel the parent owns
    os.environ["JAX_PLATFORMS"] = "cpu"


def _get_slide(path: str):
    slide = _SLIDES.get(path)
    if slide is None:
        from murcl_tpu.preprocess.slide_io import open_slide

        slide = open_slide(path)
        _SLIDES[path] = slide
    return slide


def _decode_chunk(task) -> int:
    (path, shm_name, shape, lo, coords, patch_size_level0, patch_size,
     resize_on_host) = task
    shm = SharedMemory(name=shm_name)
    try:
        out = np.ndarray(shape, dtype=np.uint8, buffer=shm.buf)
        slide = _get_slide(path)
        for j, c in enumerate(coords):
            img = slide.read_region(
                location=(c["x"], c["y"]), level=0,
                size=(patch_size_level0, patch_size_level0),
            ).convert("RGB")
            if resize_on_host and patch_size_level0 != patch_size:
                img = img.resize((patch_size, patch_size))
            out[lo + j] = np.asarray(img, dtype=np.uint8)
    finally:
        shm.close()
    return len(coords)


class ProcessDecodePool:
    """Persistent spawn-context decode pool writing into shared memory."""

    def __init__(self, num_workers: int, chunks_per_worker: int = 4):
        from concurrent.futures import ProcessPoolExecutor

        self.num_workers = max(1, num_workers)
        self._chunks_per_worker = chunks_per_worker
        self._pool = ProcessPoolExecutor(
            self.num_workers, mp_context=get_context("spawn"),
            initializer=_worker_init,
        )

    def read_patches(self, slide_path: str, coords: List[dict],
                     patch_size_level0: int, patch_size: int,
                     resize_on_host: bool = True) -> np.ndarray:
        """Decode one slide's patch regions into ``(N, S, S, 3) uint8``."""
        n = len(coords)
        out_size = patch_size if resize_on_host else patch_size_level0
        shape = (n, out_size, out_size, 3)
        shm = SharedMemory(create=True,
                           size=max(int(np.prod(shape)), 1))
        try:
            chunk = max(1, -(-n // (self.num_workers
                                    * self._chunks_per_worker)))
            tasks = [
                (slide_path, shm.name, shape, lo, coords[lo:lo + chunk],
                 patch_size_level0, patch_size, resize_on_host)
                for lo in range(0, n, chunk)
            ]
            # list() surfaces worker exceptions here
            list(self._pool.map(_decode_chunk, tasks))
            return np.ndarray(shape, np.uint8, buffer=shm.buf).copy()
        finally:
            shm.close()
            shm.unlink()

    def close(self) -> None:
        self._pool.shutdown()

    def __enter__(self) -> "ProcessDecodePool":
        return self

    def __exit__(self, *exc) -> Optional[bool]:
        self.close()
        return None
