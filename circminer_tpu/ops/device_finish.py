"""Device-resident mapping finish, part 1: k-best chain extraction.

The host pipeline fetches the chain-DP result tensors (dp10 | back) and
extracts k-best chains on the CPU (ops/chain.py extract_kbest /
native/chain_kernels.cpp batch_extract_kbest — the port of the reference's
event-ordered backtrack, src/chain.cpp:234-298).  For the fused
``device-full`` executor the chains must never leave the device: this
module re-expresses the same extraction as a fixed-shape jax program so it
can run inside the one fused dispatch, keeping only the final MatchedRead
state as the d2h payload.

Semantics replicated exactly (pinned by tests/test_device_finish.py
against extract_kbest):
  * event cells = DP cells improved by a transition (back >= 0),
  * candidate order: score desc, list desc, index asc,
  * backtrack with repeat suppression: a candidate whose head position was
    already used as a NON-head fragment of an earlier chain is skipped,
    unless it carries the global best score,
  * cap of C chains; single-fragment fallback (lists desc, index asc)
    when no chain was emitted.

Because the loop is fixed-length (ITERS event picks), a row whose event
list is longer than ITERS and still unfinished sets ``incomplete`` — the
caller defers that row to the host pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -(2 ** 29)


@partial(jax.jit, static_argnames=("k", "C", "iters"))
def extract_kbest_device(dp10, back, pos, qpos, cnt, *, k: int, C: int,
                         iters: int = 48):
    """dp10/back/pos int32 [R, NL, S], qpos/cnt int32 [R, NL].

    Returns (rpos [R,C,NL], qp [R,C,NL], clen [R,C], sc10 [R,C], cn [R],
    incomplete [R] bool) — identical layout to NativeChainer.extract_batch
    (scores as int32 score10)."""
    R, NL, S = dp10.shape
    M = NL * S
    dpf = dp10.reshape(R, M)
    backf = back.reshape(R, M)
    posf = pos.reshape(R, M)
    l_of = jnp.repeat(jnp.arange(NL, dtype=jnp.int32), S)        # [M]
    s_of = jnp.tile(jnp.arange(S, dtype=jnp.int32), NL)
    qposf = qpos[:, l_of]                                        # [R, M]
    validf = (s_of[None, :] < cnt[:, l_of]) & (backf >= 0)

    ar = jnp.arange(R)
    best10 = jnp.max(jnp.where(validf, dpf, _NEG), axis=1)       # [R]
    # candidate secondary order among score ties: list desc, index asc
    sec = l_of * S + (S - 1 - s_of)                              # [M]

    # the pick order is STATIC — picks never change dp — so sort all cells
    # once by (score desc, sec desc) and walk the prefix, instead of a
    # masked argmax + processed-scatter per iteration (was 29% of the
    # fused dispatch's device time, HW_NOTES round-3 profile)
    neg_dp = jnp.where(validf, -dpf, -_NEG)                      # [R, M]
    neg_sec = jnp.broadcast_to(-sec[None, :], (R, M))
    cell_idx = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :],
                                (R, M))
    _, _, sorted_idx = jax.lax.sort((neg_dp, neg_sec, cell_idx),
                                    num_keys=2)
    n_valid = jnp.sum(validf.astype(jnp.int32), axis=1)          # [R]

    REP = C * max(1, NL - 1)
    out_rpos = jnp.zeros((R, C, NL), jnp.int32)
    out_qp = jnp.zeros((R, C, NL), jnp.int32)
    out_clen = jnp.zeros((R, C), jnp.int32)
    out_sc = jnp.zeros((R, C), jnp.int32)
    cn = jnp.zeros((R,), jnp.int32)
    repeats = jnp.full((R, REP), -1, jnp.int32)
    rep_n = jnp.zeros((R,), jnp.int32)

    def pick_body(t, carry):
        (out_rpos, out_qp, out_clen, out_sc, cn, repeats, rep_n) = carry
        c0 = sorted_idx[:, t]                                    # [R]
        msc = dpf[ar, c0]
        has = t < n_valid
        head_pos = posf[ar, c0]
        is_rep = jnp.any(repeats == head_pos[:, None], axis=1)
        skip = (msc < best10) & is_rep
        emit = has & ~skip & (cn < C)

        # backtrack walk (bounded by NL fragments)
        slot = jnp.minimum(cn, C - 1)

        def walk_body(step, wc):
            out_rpos, out_qp, out_clen, repeats, rep_n, cur, active = wc
            cl = jnp.clip(cur, 0, M - 1)
            wr = emit & active
            out_rpos = out_rpos.at[ar, slot, step].set(
                jnp.where(wr, posf[ar, cl], out_rpos[ar, slot, step]))
            out_qp = out_qp.at[ar, slot, step].set(
                jnp.where(wr, qposf[ar, cl], out_qp[ar, slot, step]))
            out_clen = out_clen.at[ar, slot].set(
                jnp.where(wr, step + 1, out_clen[ar, slot]))
            # non-head fragments feed the repeat set (chain.cpp:266-270)
            add = wr & (step > 0)
            rslot = jnp.minimum(rep_n, REP - 1)
            repeats = repeats.at[ar, rslot].set(
                jnp.where(add, posf[ar, cl], repeats[ar, rslot]))
            rep_n = rep_n + add.astype(jnp.int32)
            nxt = backf[ar, cl]
            active = active & (nxt >= 0)
            return (out_rpos, out_qp, out_clen, repeats, rep_n,
                    jnp.where(active, nxt, cur), active)

        wc = (out_rpos, out_qp, out_clen, repeats, rep_n, c0,
              jnp.ones((R,), jnp.bool_))
        out_rpos, out_qp, out_clen, repeats, rep_n, _, _ = \
            jax.lax.fori_loop(0, NL, walk_body, wc)
        out_sc = out_sc.at[ar, slot].set(
            jnp.where(emit, msc, out_sc[ar, slot]))
        cn = cn + emit.astype(jnp.int32)
        return (out_rpos, out_qp, out_clen, out_sc, cn, repeats, rep_n)

    carry = (out_rpos, out_qp, out_clen, out_sc, cn, repeats, rep_n)
    (out_rpos, out_qp, out_clen, out_sc, cn, repeats, rep_n) = \
        jax.lax.fori_loop(0, iters, pick_body, carry)

    incomplete = (n_valid > iters) & (cn < C)

    # ---- single-fragment fallback (chain.cpp:283-298): lists desc, s asc
    fb_needed = cn == 0
    perm = (jnp.arange(NL - 1, -1, -1, dtype=jnp.int32)[:, None] * S
            + jnp.arange(S, dtype=jnp.int32)[None, :]).reshape(M)  # [M]
    v_sf = (s_of[None, :] < cnt[:, l_of])[:, perm]               # [R, M]
    rank = jnp.cumsum(v_sf.astype(jnp.int32), axis=1) - 1        # [R, M]
    take = v_sf & (rank < C)
    tgt = jnp.where(take, rank, C)                               # C = dump
    cell = perm[None, :] * jnp.ones((R, 1), jnp.int32)
    fb_rpos = jnp.zeros((R, C + 1), jnp.int32)
    fb_qp = jnp.zeros((R, C + 1), jnp.int32)
    fb_sc = jnp.zeros((R, C + 1), jnp.int32)
    rr = jnp.repeat(ar, M).reshape(R, M)
    fb_rpos = fb_rpos.at[rr, tgt].set(jnp.where(take, posf[ar[:, None],
                                                           cell], 0))
    fb_qp = fb_qp.at[rr, tgt].set(jnp.where(take, qposf[ar[:, None], cell],
                                            0))
    fb_sc = fb_sc.at[rr, tgt].set(jnp.where(take, dpf[ar[:, None], cell],
                                            0))
    n_fb = jnp.minimum(jnp.sum(v_sf, axis=1), C).astype(jnp.int32)

    fbm = fb_needed[:, None]
    out_rpos = out_rpos.at[:, :, 0].set(
        jnp.where(fbm, fb_rpos[:, :C], out_rpos[:, :, 0]))
    out_qp = out_qp.at[:, :, 0].set(
        jnp.where(fbm, fb_qp[:, :C], out_qp[:, :, 0]))
    fb_len = (jnp.arange(C)[None, :] < n_fb[:, None]).astype(jnp.int32)
    out_clen = jnp.where(fbm, fb_len, out_clen)
    out_sc = jnp.where(fbm, fb_sc[:, :C], out_sc)
    cn = jnp.where(fb_needed, n_fb, cn)

    return out_rpos, out_qp, out_clen, out_sc, cn, incomplete
