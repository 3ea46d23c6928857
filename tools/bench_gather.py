#!/usr/bin/env python3
"""Microbenchmark: random-access primitive rates on the current device.

The geno inner loop is gather-dominated (hash-bucket rows, prefilter words,
scan windows). This tool measures, for the real chip:

  - XLA gather of 4 B words from a large table (prefilter-shaped)
  - XLA gather of 128 B rows (bucket-row-shaped)
  - XLA scatter of 20 B rows (event-buffer-shaped)
  - Pallas double-buffered DMA row gather (the kernel alternative)

Rates (lanes/sec) feed the gather-bound roofline in utils/roofline.py and
decide whether a fused Pallas probe kernel can beat XLA's gather lowering.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


_RTT = None


def _rtt():
    """Host<->device round-trip for a value fetch (the axon tunnel's
    block_until_ready does NOT reliably block, so all timings here end
    with np.asarray and subtract this)."""
    global _RTT
    if _RTT is None:
        one = jax.jit(lambda x: x + 1)(jnp.uint32(1))
        np.asarray(one)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            np.asarray(jax.jit(lambda x: x + 1)(one))
            ts.append(time.perf_counter() - t0)
        _RTT = sorted(ts)[len(ts) // 2]
        print(f"# value-fetch RTT: {_RTT*1e3:.2f} ms", file=sys.stderr)
    return _RTT


def timed(fn, *args, reps=3):
    """Median per-call time over a DEPENDENT chain ending in a VALUE
    fetch. fn takes a trailing uint32 scalar `acc` (dependency token) and
    returns a scalar; chaining serializes device execution, the final
    np.asarray guarantees completion (block_until_ready is unreliable on
    the tunneled dispatch path -- it reported >HBM-peak 'gather rates').
    The chain grows until it dominates the fetch RTT, so the subtraction
    noise cannot fabricate absurd rates."""
    acc = jnp.uint32(0)
    acc = fn(*args, acc)
    np.asarray(acc)   # compile + drain
    chain = 8
    while True:
        t0 = time.perf_counter()
        for _ in range(chain):
            acc = fn(*args, acc)
        np.asarray(acc)
        total = time.perf_counter() - t0
        if total > 8 * _rtt() or chain >= 512:
            break
        chain *= 2
    ts = [max((total - _rtt()) / chain, 1e-9)]
    for _ in range(reps - 1):
        t0 = time.perf_counter()
        for _ in range(chain):
            acc = fn(*args, acc)
        np.asarray(acc)
        ts.append(max((time.perf_counter() - t0 - _rtt()) / chain, 1e-9))
    ts.sort()
    return ts[len(ts) // 2], acc


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}", file=sys.stderr)
    rng = np.random.default_rng(7)
    out = {"device": dev.device_kind}

    MB = 256
    table_w = jnp.asarray(rng.integers(0, 2**32, MB * 2**20 // 4,
                                       dtype=np.uint32))
    n_rows = MB * 2**20 // 128
    table_r = jnp.asarray(
        rng.integers(0, 2**32, (n_rows, 32), dtype=np.uint32))

    # physical plausibility ceiling: a random 4B lane costs at least one
    # HBM transaction; nothing real exceeds ~500M lanes/s on this class
    # of chip. Rates above it mean the measurement was gamed -- emit null.
    MAX_RATE = 5e8

    def plaus(r):
        return r if r < MAX_RATE else None

    for N in (1 << 20, 1 << 21):
        idx_w = jnp.asarray(rng.integers(0, table_w.shape[0], N,
                                         dtype=np.int32))
        idx_r = jnp.asarray(rng.integers(0, n_rows, N, dtype=np.int32))
        # per-lane salts make the reduction non-decomposable: XLA cannot
        # legally rewrite sum_i(T[idx_i] ^ s_i) into a histogram @ table
        # pass (without them, large-N "gather" rates exceed HBM peak)
        salt_w = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
        salt_r = jnp.asarray(rng.integers(0, 2**32, (N, 32),
                                          dtype=np.uint32))

        @jax.jit
        def g_word(t, i, s, acc):
            # optimization_barrier: real data dependency on the previous
            # call's result, so chained calls serialize on device
            i2, acc2 = jax.lax.optimization_barrier((i, acc))
            return jnp.sum(jnp.take(t, i2, axis=0, mode="clip") ^ s,
                           dtype=jnp.uint32) ^ acc2

        @jax.jit
        def g_row(t, i, s, acc):
            i2, acc2 = jax.lax.optimization_barrier((i, acc))
            return jnp.sum(jnp.take(t, i2, axis=0, mode="clip") ^ s,
                           dtype=jnp.uint32) ^ acc2

        tw, _ = timed(g_word, table_w, idx_w, salt_w)
        tr, _ = timed(g_row, table_r, idx_r, salt_r)
        # sorted-index variants: if these run much faster, random probes
        # should be SORTED first (quasi-sequential HBM access), i.e. a
        # sort-merge join beats point lookups
        tws, _ = timed(g_word, table_w, jnp.sort(idx_w), salt_w)
        trs, _ = timed(g_row, table_r, jnp.sort(idx_r), salt_r)
        print(f"N={N:8d}  word-gather {N/tw/1e6:8.1f} Mlanes/s "
              f"({N*4/tw/1e9:6.2f} GB/s)  sorted {N/tws/1e6:8.1f}   "
              f"row-gather {N/tr/1e6:8.1f} Mlanes/s "
              f"({N*128/tr/1e9:6.2f} GB/s)  sorted {N/trs/1e6:8.1f}")
        out[f"word_gather_{N}"] = plaus(N / tw)
        out[f"row_gather_{N}"] = plaus(N / tr)
        out[f"word_gather_sorted_{N}"] = plaus(N / tws)
        out[f"row_gather_sorted_{N}"] = plaus(N / trs)

    # full-lane-width rows (128 u32 = 512 B -- the combined hash table's
    # bucket row): XLA row-DMAs these instead of scalarizing, measured
    # ~3.4x FASTER per row than 128 B rows on v5e (tools/bench_rowwidth.py
    # has the full width sweep); feeds roofline's row512 rate
    n_rows5 = MB * 2**20 // 512
    table_r5 = jnp.asarray(
        rng.integers(0, 2**32, (n_rows5, 128), dtype=np.uint32))
    N5 = 1 << 19
    idx_r5 = jnp.asarray(rng.integers(0, n_rows5, N5, dtype=np.int32))
    salt_r5 = jnp.asarray(rng.integers(0, 2**32, (N5, 128),
                                       dtype=np.uint32))

    @jax.jit
    def g_row5(t, i, s, acc):
        i2, acc2 = jax.lax.optimization_barrier((i, acc))
        return jnp.sum(jnp.take(t, i2, axis=0, mode="clip") ^ s,
                       dtype=jnp.uint32) ^ acc2

    tr5, _ = timed(g_row5, table_r5, idx_r5, salt_r5)
    print(f"row-gather 512B {N5/tr5/1e6:8.1f} Mlanes/s "
          f"({N5*512/tr5/1e9:6.2f} GB/s)")
    out["row_gather_512B"] = plaus(N5 / tr5)
    del table_r5, salt_r5

    # shaped-index penalty: the SAME row gather issued with (B, K)-shaped
    # indices. XLA materializes a (B, K, 32, 1) result whose trailing unit
    # dim is tiled to 128 lanes -- measured ~3x slower than flat indices
    # (engine.hashtable flattens every lookup because of this; keep the
    # measurement here so a future XLA that fixes it is noticed)
    N = 1 << 20
    idx2d = jnp.asarray(rng.integers(0, n_rows, (N // 4, 4),
                                     dtype=np.int32))
    salt2d = jnp.asarray(rng.integers(0, 2**32, (N // 4, 4, 32),
                                      dtype=np.uint32))

    @jax.jit
    def g_row2d(t, i, s, acc):
        i2, acc2 = jax.lax.optimization_barrier((i, acc))
        return jnp.sum(jnp.take(t, i2, axis=0, mode="clip") ^ s,
                       dtype=jnp.uint32) ^ acc2

    t2d, _ = timed(g_row2d, table_r, idx2d, salt2d)
    print(f"row-gather shaped (B,4) {N/t2d/1e6:8.1f} Mlanes/s "
          f"(flat is ~3x this on v5e)")
    out["row_gather_shaped_1048576"] = plaus(N / t2d)

    # device-side sort rate (the enabler for sort-merge designs)
    N = 1 << 21
    keys = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))

    @jax.jit
    def dsort(k, acc):
        k2, acc2 = jax.lax.optimization_barrier((k, acc))
        s = jnp.sort(k2)
        return (s[0] + s[-1]) ^ acc2

    tso, _ = timed(dsort, keys)
    print(f"device-sort u32 {N/tso/1e6:8.1f} Mkeys/s")
    out["device_sort_u32"] = N / tso  # sorts are legitimately fast

    # scatter of 20 B rows into a (B, E, 5) u32 buffer (event-shaped)
    B, E = 32768, 16
    N = B * 4
    rows_b = jnp.asarray(rng.integers(0, B, N, dtype=np.int32))
    rows_e = jnp.asarray(rng.integers(0, E, N, dtype=np.int32))
    vals = jnp.asarray(rng.integers(0, 2**32, (N, 5), dtype=np.uint32))

    @jax.jit
    def scat(rb, re, v, acc):
        rb2, acc2 = jax.lax.optimization_barrier((rb, acc))
        buf = jnp.zeros((B, E + 1, 5), jnp.uint32)
        return buf.at[rb2, re].set(v, mode="drop").sum(
            dtype=jnp.uint32) ^ acc2

    ts, _ = timed(scat, rows_b, rows_e, vals)
    print(f"scatter-20B {N/ts/1e6:8.1f} Mlanes/s")
    out["scatter_rows"] = plaus(N / ts)

    # SCALAR-element scatter into a flat word buffer (the engine's event
    # writes): vectorizes ~25x faster per source lane than a row scatter
    flat_t = jnp.asarray(rng.integers(0, B * (E + 1), N, dtype=np.int32))

    @jax.jit
    def scat1(ft, v, acc):
        ft2, acc2 = jax.lax.optimization_barrier((ft, acc))
        buf = jnp.zeros(B * (E + 1), jnp.uint32)
        return buf.at[ft2].set(v[:, 0], mode="drop").sum(
            dtype=jnp.uint32) ^ acc2

    ts1, _ = timed(scat1, flat_t, vals)
    print(f"scatter-scalar {N/ts1/1e6:8.1f} Mlanes/s")
    out["scatter_scalar"] = N / ts1  # vectorized, legitimately fast

    # Pallas DMA row gather: per-lane async copies, double buffered
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        N = 1 << 16
        idx = jnp.asarray(rng.integers(0, n_rows, N, dtype=np.int32))
        NBUF = 8

        def kern(idx_ref, tab_ref, out_ref):
            def body(scratch, sem):
                def get(slot, i):
                    return pltpu.make_async_copy(
                        tab_ref.at[idx_ref[i]], scratch.at[slot],
                        sem.at[slot])

                for s in range(NBUF):
                    get(s, s).start()

                def loop(i, acc):
                    slot = jax.lax.rem(i, NBUF)
                    get(slot, i).wait()
                    acc = acc + jnp.sum(
                        scratch[slot].astype(jnp.int32))

                    @pl.when(i + NBUF < N)
                    def _():
                        get(slot, i + NBUF).start()

                    return acc

                acc = jax.lax.fori_loop(0, N, loop, jnp.int32(0))
                out_ref[0, 0] = acc

            pl.run_scoped(
                body,
                scratch=pltpu.VMEM((NBUF, 32), jnp.uint32),
                sem=pltpu.SemaphoreType.DMA((NBUF,)),
            )

        @jax.jit
        def pallas_gather(i, t, acc):
            i2, acc2 = jax.lax.optimization_barrier((i, acc))
            r = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            )(i2, t)
            return r[0, 0].astype(jnp.uint32) ^ acc2

        tp, _ = timed(pallas_gather, idx, table_r, reps=4)
        print(f"pallas-row-gather(seq-dma x{NBUF}) "
              f"{N/tp/1e6:8.1f} Mlanes/s ({N*128/tp/1e9:6.2f} GB/s)")
        out["pallas_row_gather"] = plaus(N / tp)
    except Exception as e:  # noqa: BLE001
        print(f"# pallas gather failed: {e!r}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
