"""FASTQ streaming into fixed-shape padded batches (host side).

Replaces the reference's one-read-at-a-time fgets loop (src/qv.cc:760-763)
with a chunked reader that yields numpy arrays ready for device transfer:
base codes (B, L) uint8 (N=4, pad=4), per-read true k-mer counts, and the
per-kmer-index quality characters the neighbor search is gated on
(src/qv.cc:836: the reference indexes the quality string by *k-mer index*).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np

from ..core.kmer import np_codes_from_bytes


@dataclasses.dataclass
class ReadBatch:
    codes: np.ndarray      # (B, L) uint8 base codes; pad/N = 4, invalid = 7
    n_kmers: np.ndarray    # (B,) int32 floor(read_len/32), capped at K slots
    qual: np.ndarray       # (B, Kmax) uint8 quality char at kmer index
    n_valid: int           # number of real (non-pad) reads in this batch


def iter_read_batches(path: str, batch_reads: int, max_read_len: int,
                      max_kmers: int, skip_reads: int = 0,
                      use_native: bool = True) -> Iterator[ReadBatch]:
    B, L, Km = batch_reads, max_read_len, max_kmers
    if use_native:
        from .. import native

        if native.available():
            for codes, n_kmers, qual, got in native.fastq_batches(
                    path, B, L, Km, skip_reads=skip_reads):
                yield ReadBatch(codes, n_kmers, qual, got)
            return
    codes = np.full((B, L), 4, np.uint8)
    n_kmers = np.zeros(B, np.int32)
    qual = np.zeros((B, Km), np.uint8)
    fill = 0
    with open(path, "rb") as f:
        for _ in range(skip_reads * 4):
            f.readline()
        while True:
            rid = f.readline()
            if not rid:
                break
            seq = f.readline().rstrip(b"\n")
            _sep = f.readline()
            q = f.readline().rstrip(b"\n")
            ln = min(len(seq), L)
            k = min(ln // 32, Km)
            c = np_codes_from_bytes(seq[:ln])
            codes[fill, :ln] = c
            codes[fill, ln:] = 4
            n_kmers[fill] = k
            nq = min(len(q), Km)
            qrow = np.zeros(Km, np.uint8)
            qrow[:nq] = np.frombuffer(q[:nq], np.uint8)
            qual[fill] = qrow
            fill += 1
            if fill == B:
                yield ReadBatch(codes.copy(), n_kmers.copy(), qual.copy(), B)
                codes[:] = 4
                n_kmers[:] = 0
                qual[:] = 0
                fill = 0
    if fill:
        yield ReadBatch(codes.copy(), n_kmers.copy(), qual.copy(), fill)


def prefetch(it, depth: int = 2):
    """Run an iterator on a background thread with a bounded queue, so
    batch parsing/encoding overlaps device compute instead of serializing
    into the dispatch loop. Exceptions propagate to the consumer.

    Closing the consumer generator early (or abandoning it) signals the
    worker to stop, so no thread is left blocked on a full queue at
    interpreter shutdown."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in it:
                if not _put(item):
                    return
            _put(_END)
        except BaseException as e:  # noqa: BLE001 - repropagated below
            _put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while True:  # unblock a worker waiting on a full queue
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)
