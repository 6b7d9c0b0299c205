#!/usr/bin/env python
"""TPU microbenchmark: characterize the tunneled chip so the pipeline's
dispatch/transfer budget is designed from measurements, not guesses.

Measures: dispatch RTT, H2D/D2H bandwidth, device seed lookup, device chain
DP, and the Pallas X-drop kernel compiled for real (no interpret).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, n=10, warmup=2):
    for _ in range(warmup):
        r = fn()
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    dev = jax.devices()[0]
    print(f"device={dev} platform={dev.platform}", flush=True)

    # 1. dispatch RTT
    x = jax.device_put(jnp.ones((8, 128), jnp.float32))
    f = jax.jit(lambda a: a + 1)
    rtt = timeit(lambda: f(x), n=30)
    print(f"rtt_trivial_dispatch_ms={rtt*1e3:.2f}", flush=True)

    # 2. transfer bandwidth
    for mb in (2, 16, 64):
        a = np.ones((mb * 1024 * 1024,), np.int8)
        t = timeit(lambda: jax.device_put(a), n=5)
        print(f"h2d_{mb}MB_ms={t*1e3:.1f} bw={mb/t:.0f}MB/s", flush=True)
        d = jax.device_put(a)
        t = timeit(lambda: np.asarray(d), n=5)
        print(f"d2h_{mb}MB_ms={t*1e3:.1f} bw={mb/t:.0f}MB/s", flush=True)

    # 3. seed lookup at bench-like scale (5M-entry index, R=16384 reads)
    from circminer_tpu.ops.seed import lookup_batch_device
    rng = np.random.default_rng(0)
    n_entries = 5_000_000
    n_buckets = 4 ** 14
    hv = np.sort(rng.integers(0, n_buckets, n_entries))
    counts = np.bincount(hv, minlength=n_buckets).astype(np.int32)
    bucket_start = np.zeros(n_buckets + 1, np.int32)
    bucket_start[1:] = np.cumsum(counts, dtype=np.int32)
    checksum = rng.integers(0, 4096, n_entries).astype(np.int16)
    # sort checksums within buckets
    order = np.lexsort((checksum, hv))
    checksum = checksum[order]
    bs_d = jax.device_put(bucket_start)
    cs_d = jax.device_put(checksum)
    R, L = 16384, 120
    reads = rng.integers(0, 4, (R, L)).astype(np.int8)
    lens = np.full(R, 100, np.int32)
    reads_d = jax.device_put(reads)
    lens_d = jax.device_put(lens)

    def do_lookup():
        return lookup_batch_device(
            reads_d, lens_d, bs_d, cs_d, k=20, cs_len=6, n_slots=11,
            seed_lim=500)
    t = timeit(do_lookup, n=5)
    print(f"lookup_16384x120_ms={t*1e3:.1f} ({R/t:.0f} rows/s)", flush=True)

    # 4. chain DP at bench shape (cap=16)
    from circminer_tpu.ops.chain import chain_batch_device
    NL, S = 6, 16
    pos = np.sort(rng.integers(1, 5_000_000, (R, NL, S)).astype(np.int32), axis=-1)
    cnt = rng.integers(0, S + 1, (R, NL)).astype(np.int32)
    qpos = (np.arange(NL, dtype=np.int32) * 20)[None, :].repeat(R, 0)
    seq_len = np.full(R, 100, np.int32)
    n_iv = 1024
    seg_pad = 16
    iv_spos = np.sort(rng.integers(1, 5_000_000, n_iv)).astype(np.int32)
    iv_epos = iv_spos + 200
    args = [jax.device_put(v) for v in (
        pos, cnt, qpos, seq_len,
        np.zeros(5_000_000 // 32 + 2, np.int32), iv_spos, iv_epos,
        iv_epos, iv_spos, iv_epos, np.ones(n_iv, np.int32),
        np.tile(iv_epos[:, None], (1, seg_pad)),
        np.tile(iv_spos[:, None], (1, seg_pad)))]

    def do_chain():
        return chain_batch_device(*args, k=20, max_ed=4,
                                  max_intron=2_000_000, seg_pad=seg_pad)
    t = timeit(do_chain, n=5)
    print(f"chain_16384x{NL}x{S}_ms={t*1e3:.1f} ({R/t:.0f} rows/s)", flush=True)

    # 5. Pallas X-drop compiled (the hardware-proof VERDICT item 3)
    from circminer_tpu.ops.pallas_align import xdrop_batch_pallas, xdrop_batch_ref
    B, I = 2048, 128
    s = rng.integers(0, 4, (B, I - 1)).astype(np.int8)
    t_ = s.copy()
    mut = rng.random((B, I - 1)) < 0.05
    t_[mut] = (t_[mut] + 1) % 4
    n = rng.integers(20, 110, B).astype(np.int32)
    m = np.clip(n + rng.integers(-3, 4, B), 1, I - 1).astype(np.int32)
    sd, td = jax.device_put(s), jax.device_put(t_)
    nd, md = jax.device_put(n), jax.device_put(m)
    kw = dict(w=3, mat=1, mis=-3, ind=-3, xd=8, I=I)
    try:
        out_p = xdrop_batch_pallas(sd, td, nd, md, block_b=256, **kw)
        jax.block_until_ready(out_p)
        out_r = xdrop_batch_ref(sd, td, nd, md, **kw)
        agree = all(np.array_equal(np.asarray(a), np.asarray(b))
                    for a, b in zip(out_p, out_r))
        tp = timeit(lambda: xdrop_batch_pallas(sd, td, nd, md, block_b=256, **kw), n=5)
        tr = timeit(lambda: xdrop_batch_ref(sd, td, nd, md, **kw), n=5)
        print(f"pallas_xdrop_compiled ok agree={agree} "
              f"pallas_ms={tp*1e3:.1f} ref_ms={tr*1e3:.1f} "
              f"({B/tp:.0f} aln/s pallas)", flush=True)
    except Exception as e:
        print(f"pallas_xdrop_compiled FAILED: {type(e).__name__}: {e}",
              flush=True)

    print("probe done", flush=True)


if __name__ == "__main__":
    main()
