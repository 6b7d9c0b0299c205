#!/usr/bin/env python
"""Probe 2: honest d2h measurement + chain DP cost attribution."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def timeit(fn, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    # honest d2h: array computed ON device, then fetched
    for mb in (2, 13, 64):
        nelem = mb * 1024 * 1024 // 4
        f = jax.jit(lambda key: jax.random.randint(key, (nelem,), 0, 100, jnp.int32))
        d = f(jax.random.PRNGKey(0))
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        h = np.asarray(d)
        t = time.perf_counter() - t0
        print(f"d2h_computed_{mb}MB_ms={t*1e3:.1f} bw={mb/t:.0f}MB/s", flush=True)

    # chain DP attribution: run variants
    R, NL, S = 16384, 6, 16
    M = NL * S
    pos = np.sort(rng.integers(1, 5_000_000, (R, NL, S)).astype(np.int32), axis=-1)
    cnt = rng.integers(0, S + 1, (R, NL)).astype(np.int32)
    qpos = (np.arange(NL, dtype=np.int32) * 20)[None, :].repeat(R, 0)
    seq_len = np.full(R, 100, np.int32)
    n_iv = 1024
    seg_pad = 16
    iv_spos = np.sort(rng.integers(1, 5_000_000, n_iv)).astype(np.int32)
    iv_epos = iv_spos + 200
    d = lambda v: jax.device_put(v)
    pos_d, cnt_d, qpos_d, seq_d = d(pos), d(cnt), d(qpos), d(seq_len)
    nb_bits = d(np.zeros(5_000_000 // 32 + 2, np.int32))
    iv_spos_d, iv_epos_d = d(iv_spos), d(iv_epos)
    iv_nseg = d(np.ones(n_iv, np.int32))
    seg_end = d(np.tile(iv_epos[:, None], (1, seg_pad)))
    seg_next = d(np.tile(iv_spos[:, None], (1, seg_pad)))
    k, max_ed, max_intron = 20, 4, 2_000_000

    # variant A: current implementation
    from circminer_tpu.ops.chain import chain_batch_device
    tA = timeit(lambda: chain_batch_device(
        pos_d, cnt_d, qpos_d, seq_d, nb_bits, iv_spos_d, iv_epos_d,
        iv_epos_d, iv_spos_d, iv_epos_d, iv_nseg, seg_end, seg_next,
        k=k, max_ed=max_ed, max_intron=max_intron, seg_pad=seg_pad))
    print(f"chainA_current_ms={tA*1e3:.1f}", flush=True)

    # variant B: no junction gate (genome gate only) - isolates seg-loop cost
    @partial(jax.jit, static_argnames=("k", "max_ed"))
    def chain_nojunc(pos, cnt, qpos, seq_len, *, k, max_ed):
        B = pos.shape[0]
        posf = pos.reshape(B, M)
        slot_of = jnp.repeat(jnp.arange(NL, dtype=jnp.int32), S)
        idx_in_slot = jnp.tile(jnp.arange(S, dtype=jnp.int32), NL)
        validf = idx_in_slot[None, :] < cnt[:, slot_of]
        qposf = qpos[:, slot_of]
        read_remain = seq_len[:, None] - qposf - k
        ub = posf + read_remain + max_ed
        alpha10 = jnp.int32(200000) * k
        dp = jnp.where(validf, jnp.int32(10 * k), -(2**29))
        back = jnp.full((B, M), -1, jnp.int32)
        pj = posf[:, None, :]
        for l in range(NL - 2, -1, -1):
            rows = slice(l * S, (l + 1) * S)
            pi = posf[:, rows, None]
            rd = qposf[:, None, :] - qposf[:, rows, None] - k
            gd = pj - pi - k
            ok = (validf[:, rows, None] & validf[:, None, :]
                  & (slot_of[None, rows, None] < slot_of[None, None, :])
                  & (pj > pi) & (pj <= ub[:, rows, None])
                  & (jnp.abs(gd - rd) <= max_ed))
            trans = jnp.where(ok, alpha10 - jnp.abs(gd - rd), -(2**29))
            cand = trans + dp[:, None, :]
            bestv = jnp.max(cand, axis=-1)
            besti = jnp.argmax(cand, axis=-1).astype(jnp.int32)
            improve = bestv > dp[:, rows]
            dp = dp.at[:, rows].set(jnp.where(improve, bestv, dp[:, rows]))
            back = back.at[:, rows].set(jnp.where(improve, besti, back[:, rows]))
        return dp, back

    tB = timeit(lambda: chain_nojunc(pos_d, cnt_d, qpos_d, seq_d,
                                     k=k, max_ed=max_ed))
    print(f"chainB_nojunc_ms={tB*1e3:.1f}", flush=True)

    # variant C: B + precomputed-per-cell junction data folded in as
    # elementwise-only ops (seg data as [B, M, P] gathered once)
    @partial(jax.jit, static_argnames=("k", "max_ed", "P"))
    def chain_full_pre(pos, cnt, qpos, seq_len, ub, mee, segE, segN, nseg,
                       *, k, max_ed, P):
        B = pos.shape[0]
        posf = pos.reshape(B, M)
        slot_of = jnp.repeat(jnp.arange(NL, dtype=jnp.int32), S)
        idx_in_slot = jnp.tile(jnp.arange(S, dtype=jnp.int32), NL)
        validf = idx_in_slot[None, :] < cnt[:, slot_of]
        qposf = qpos[:, slot_of]
        alpha10 = jnp.int32(200000) * k
        dp = jnp.where(validf, jnp.int32(10 * k), -(2**29))
        back = jnp.full((B, M), -1, jnp.int32)
        pj = posf[:, None, :]
        e1f = posf + k - 1
        for l in range(NL - 2, -1, -1):
            rows = slice(l * S, (l + 1) * S)
            pi = posf[:, rows, None]
            rd = qposf[:, None, :] - qposf[:, rows, None] - k
            gd = pj - pi - k
            base_ok = (validf[:, rows, None] & validf[:, None, :]
                       & (slot_of[None, rows, None] < slot_of[None, None, :])
                       & (pj > pi) & (pj <= ub[:, rows, None]))
            mee_r = mee[:, rows, None]
            g_ok = ((mee_r == 0) | ((pj + k - 1) <= mee_r)) & \
                   (jnp.abs(gd - rd) <= max_ed)
            # junction: loop P with elementwise only
            e1_r = e1f[:, rows, None]
            jn_ok = jnp.zeros_like(base_ok)
            jn_dist = jnp.zeros(base_ok.shape, jnp.int32)
            intron_any = jnp.zeros_like(base_ok)
            for p in range(P):
                sep = segE[:, rows, p:p+1]
                snp = segN[:, rows, p:p+1]
                pv = (nseg[:, rows, None] > p)
                e12end = sep - e1_r
                beg2s2 = pj - snp
                td = e12end + beg2s2
                acc = pv & (e12end >= 0) & (beg2s2 >= 0) & \
                      (jnp.abs(td - rd) <= max_ed)
                jn_dist = jnp.where(~jn_ok & acc, td, jn_dist)
                jn_ok = jn_ok | acc
                intron_any = intron_any | (pv & (e12end >= 0) & (e12end < rd)
                                           & ((beg2s2 + k) < 0))
            s2_gt_e1 = pj > e1_r
            j_ok = s2_gt_e1 & (jn_ok | intron_any)
            distt = jnp.where(g_ok, gd,
                              jnp.where(jn_ok, jn_dist, pj - e1_r - 1))
            ok = base_ok & (g_ok | j_ok)
            trans = jnp.where(ok, alpha10 - jnp.abs(distt - rd), -(2**29))
            cand = trans + dp[:, None, :]
            bestv = jnp.max(cand, axis=-1)
            besti = jnp.argmax(cand, axis=-1).astype(jnp.int32)
            improve = bestv > dp[:, rows]
            dp = dp.at[:, rows].set(jnp.where(improve, bestv, dp[:, rows]))
            back = back.at[:, rows].set(
                jnp.where(improve, besti, back[:, rows]))
        return dp, back

    ub = pos.reshape(R, M) + 100
    mee = np.zeros((R, M), np.int32)
    segE = np.tile(iv_epos[:seg_pad][None, None, :], (1, M, 1)).repeat(R, 0)[:, :, :seg_pad].astype(np.int32)
    segN = np.tile(iv_spos[:seg_pad][None, None, :], (1, M, 1)).repeat(R, 0)[:, :, :seg_pad].astype(np.int32)
    nseg = np.ones((R, M), np.int32)
    tC = timeit(lambda: chain_full_pre(
        pos_d, cnt_d, qpos_d, seq_d, d(ub), d(mee), d(segE), d(segN),
        d(nseg), k=k, max_ed=max_ed, P=seg_pad))
    print(f"chainC_precomp_ms={tC*1e3:.1f}", flush=True)
    tC2 = timeit(lambda: chain_full_pre(
        pos_d, cnt_d, qpos_d, seq_d, d(ub), d(mee), d(segE), d(segN),
        d(nseg), k=k, max_ed=max_ed, P=4))
    print(f"chainC_precomp_P4_ms={tC2*1e3:.1f}", flush=True)
    print("probe2 done", flush=True)


if __name__ == "__main__":
    main()
