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
    # once by (score desc, sec desc); and the backtrack WALKS are emission-
    # independent, so they hoist out of the serial loop entirely: all T
    # candidate walks run as parallel take_along_axis gathers, the serial
    # loop touches only [R]/[R, REP] emission state, and the chain tensors
    # assemble in ONE gather at the end.  (The per-iteration walk+scatter
    # formulation on [R, C, NL] tensors cost ~4.9 s of the 6.7 s fused
    # dispatch — HW_NOTES round-3 stage bisection.)
    neg_dp = jnp.where(validf, -dpf, -_NEG)                      # [R, M]
    neg_sec = jnp.broadcast_to(-sec[None, :], (R, M))
    cell_idx = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :],
                                (R, M))
    _, _, sorted_idx = jax.lax.sort((neg_dp, neg_sec, cell_idx),
                                    num_keys=2)
    n_valid = jnp.sum(validf.astype(jnp.int32), axis=1)          # [R]

    T = iters
    heads = sorted_idx[:, :T]                                    # [R, T]
    sc_sorted = jnp.take_along_axis(dpf, heads, axis=1)          # [R, T]

    # ---- parallel walks of every candidate (bounded by NL fragments) ----
    cur = heads
    active = jnp.ones((R, T), jnp.bool_)
    wcells, wact = [], []
    for _ in range(NL):
        wcells.append(cur)
        wact.append(active)
        nxt = jnp.take_along_axis(backf, jnp.clip(cur, 0, M - 1), axis=1)
        active = active & (nxt >= 0)
        cur = jnp.where(active, nxt, cur)
    wc = jnp.stack(wcells, axis=2)                               # [R, T, NL]
    wa = jnp.stack(wact, axis=2)
    clen_all = jnp.sum(wa.astype(jnp.int32), axis=2)             # [R, T]
    wpos = jnp.take_along_axis(posf, wc.reshape(R, T * NL),
                               axis=1).reshape(R, T, NL)
    wqp = jnp.take_along_axis(qposf, wc.reshape(R, T * NL),
                              axis=1).reshape(R, T, NL)
    head_pos_all = wpos[:, :, 0]                                 # [R, T]

    # ---- serial emission (repeat suppression is order-dependent) --------
    # The candidate walks are all known BEFORE emission, so the repeat test
    # collapses to a precomputed collision matrix:
    #   coll[t', t] = head_pos(t) appears among the NON-HEAD fragments of
    #                 candidate t'  (chain.cpp:266-270's repeat set, but for
    #                 every possible emitter at once)
    # and is_rep(t) = any(emitted & coll[:, t]).  The 48-step serial loop
    # then carries only an emitted-mask [T, R] and does ONE slice + one
    # [T, R] reduction per step — no scatters, no [REP, R] repeat buffer.
    # (The previous repeat-buffer loop cost ~0.9 s of the fused dispatch.)
    sc_T = sc_sorted.T                                           # [T, R]
    hp_T = head_pos_all.T
    wpos_T = jnp.moveaxis(wpos, 1, 0)                            # [T, R, NL]
    wa_T = jnp.moveaxis(wa, 1, 0)
    coll = jnp.zeros((T, T, R), jnp.bool_)
    for f in range(1, NL):
        coll = coll | ((wpos_T[:, None, :, f] == hp_T[None, :, :])
                       & wa_T[:, None, :, f])
    cn = jnp.zeros((R,), jnp.int32)
    emitted = jnp.zeros((T, R), jnp.bool_)

    def pick_body(t, carry):
        cn, emitted = carry
        msc = jax.lax.dynamic_index_in_dim(sc_T, t, axis=0,
                                           keepdims=False)       # [R]
        has = t < n_valid
        coll_t = jax.lax.dynamic_index_in_dim(coll, t, axis=1,
                                              keepdims=False)    # [T, R]
        is_rep = jnp.any(emitted & coll_t, axis=0)               # [R]
        emit = has & ~((msc < best10) & is_rep) & (cn < C)
        emitted = jax.lax.dynamic_update_slice_in_dim(
            emitted, emit[None, :], t, axis=0)
        cn = cn + emit.astype(jnp.int32)
        return cn, emitted

    cn, emitted = jax.lax.fori_loop(0, T, pick_body, (cn, emitted))
    emit_mask = emitted.T                                        # [R, T]

    # ---- one-shot assembly: slot c <- the c-th emitted pick -------------
    esl = jnp.cumsum(emit_mask.astype(jnp.int32), axis=1) - 1    # [R, T]
    esl = jnp.where(emit_mask, jnp.minimum(esl, C - 1), C)
    tvals = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :],
                             (R, T))
    pick_of_slot = jnp.zeros((R, C + 1), jnp.int32).at[
        ar[:, None], esl].set(tvals)[:, :C]                      # [R, C]
    slot_valid = jnp.arange(C)[None, :] < cn[:, None]            # [R, C]
    psafe = jnp.clip(pick_of_slot, 0, T - 1)
    gather3 = lambda a: jnp.take_along_axis(
        a, psafe[:, :, None], axis=1)                            # [R, C, NL]
    sel_wa = gather3(wa) & slot_valid[:, :, None]
    out_rpos = jnp.where(sel_wa, gather3(wpos), 0)
    out_qp = jnp.where(sel_wa, gather3(wqp), 0)
    out_clen = jnp.where(slot_valid,
                         jnp.take_along_axis(clen_all, psafe, axis=1), 0)
    out_sc = jnp.where(slot_valid,
                       jnp.take_along_axis(sc_sorted, psafe, axis=1), 0)

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
