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


# The reference reads each FASTQ line into a 1023-char fgets buffer
# (src/qv.cc:700), so its sequence envelope is 1022 bases = 31 k-mers;
# reads are floored to 32-base multiples anyway (src/qv.cc:778-779), so
# 992 padded bases reproduce its behavior for ANY input it can handle.
REF_MAX_READ_LEN = 992


def peek_max_read_len(path: str, n_reads: int = 8192) -> int:
    """Maximum sequence length among the first ``n_reads`` records (fast
    header-free scan; used by the CLI to auto-size max_read_len so >128 bp
    FASTQs are not silently truncated at default flags)."""
    mx = 0
    with open(path, "rb") as f:
        for i in range(n_reads):
            if not f.readline():
                break
            seq = f.readline()
            if not seq:
                break
            mx = max(mx, len(seq.rstrip(b"\n")))
            f.readline()
            f.readline()
    return mx


def autosize_read_len(path: str, n_reads: int = 8192) -> int:
    """max_read_len for a FASTQ: the 32-multiple covering the longest of
    the first n_reads reads, in [128, REF_MAX_READ_LEN]. (The streaming
    reader still warns if a longer read appears later in the file.)"""
    mx = peek_max_read_len(path, n_reads)
    return max(128, min((mx // 32) * 32, REF_MAX_READ_LEN))


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
    max_slen = 0
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
            max_slen = max(max_slen, len(seq))
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
    if (max_slen // 32) * 32 > (L // 32) * 32:
        import warnings

        warnings.warn(
            f"FASTQ contains reads up to {max_slen} bases but "
            f"max_read_len={L}: long reads were TRUNCATED and results may "
            f"diverge from the reference. Re-run with --max-read-len "
            f"{min((max_slen // 32) * 32, REF_MAX_READ_LEN)} or let the "
            f"CLI auto-size from the FASTQ.")


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
    _ERR = object()   # sentinel wrapper: items that ARE exceptions still yield
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
                if not _put((None, item)):
                    return
            _put((_END, None))
        except BaseException as e:  # noqa: BLE001 - repropagated below
            _put((_ERR, e))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            tag, item = q.get()
            if tag is _END:
                return
            if tag is _ERR:
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
        if t.is_alive():
            # the wrapped iterator is blocked inside next() and cannot see
            # the stop flag; surface it instead of silently leaking the
            # daemon thread (it dies with the process either way)
            import warnings
            warnings.warn("prefetch worker did not stop within 5s "
                          "(producer blocked in next()); daemon thread "
                          "left running")
