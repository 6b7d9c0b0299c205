"""Batched device alignment service for the wave extension engine.

Solves whole *waves* of alignment requests (the tuples yielded by
pipeline/extend.py generators) as a handful of batched device dispatches —
one per request kind — instead of one scalar kernel call per candidate
(the reference's per-read recursion, src/extend.cpp:491-875 +
src/align.cpp:556-723).

Kind -> kernel mapping:
  edit_sc_r / edit_sc_l   -> edit_sc_scan (banded edit DP + soft-clip scan,
                             pallas_align.py; left = reversed inputs, the
                             oracle's global_banded_alignment_reverse)
  drop_sc_r / drop_sc_l   -> xdrop_scan + drop_local_sc_batch wrap-up
  end_r / end_l           -> edit_end_scan (banded edit DP, candidates on
                             the j == m column only; align.cpp:556-576)
  one_side                -> one_side_scan (one-sided band, per-item width;
                             align.cpp:219-252)

Requests whose shapes fall outside a kernel's banded regime (the oracle
falls back to full DP there, align.cpp:397-399) are answered by the scalar
host aligner — they are tiny by construction.  Everything else is padded
into fixed [B, I] int8 buffers (I = 128 covers reads <= 120 + band), and
the result crosses the tunnel as one 2-D int32 tensor per kind
(HW_NOTES.md: 1-D and >2-D small fetches hit pathological paths).

All outputs are bit-identical to ops/align.py (pinned by
tests/test_align_device.py and end-to-end by tests/test_extend_batch.py).
"""

from __future__ import annotations

from collections import defaultdict
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import align as al
from .pallas_align import (POS, _diff_diag, edit_sc_batch_ref,
                           xdrop_batch_ref, drop_local_sc_batch)


# --------------------------------------------------------------------------
# banded edit DP, candidates on the j == m column (local_alignment_right)
# --------------------------------------------------------------------------

def edit_end_scan_ref(s: jnp.ndarray, t: jnp.ndarray, n: jnp.ndarray,
                      m: jnp.ndarray, *, w: int, max_ed: int,
                      I: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched local_alignment_right (align.cpp:556-576): banded edit DP,
    then the best AlignCandid over column j == m, i in [m-w, m+w] & i <= n —
    order ed asc, |indel| asc, first-encountered (smallest i) on ties.

    Returns (ed, indel) int32 [B]; no candidate -> (max_ed+1, w+1).
    Valid in the banded regime (n > 2w, m > w); callers route the rest to
    the host oracle."""
    B = s.shape[0]
    s_pad = jnp.pad(s, ((0, 0), (0, I - s.shape[1]))).astype(jnp.int8)
    t_pad = jnp.pad(t, ((0, 0), (0, I - t.shape[1]))).astype(jnp.int8)
    t_rev = t_pad[:, ::-1]
    i_vec = jax.lax.broadcasted_iota(jnp.int32, (B, I), 1)

    d2 = jnp.where(i_vec == 0, 0, POS)
    d1 = jnp.where(i_vec <= 1, 1, POS)
    d1 = jnp.where((i_vec <= 1) & (i_vec <= n[:, None])
                   & ((1 - i_vec) <= m[:, None]), d1, POS)
    # banded regime => m > w >= 0, so column-m candidates first appear at
    # diagonal k = m > 1: the two seed diagonals never hold one
    best_key = jnp.zeros((B,), jnp.int32)
    best_ed = jnp.full((B,), max_ed + 1, jnp.int32)
    best_indel = jnp.full((B,), w + 1, jnp.int32)

    def step(carry, k):
        d2, d1, best_key, best_ed, best_indel = carry
        mis = _diff_diag(s_pad, t_rev, k, I).astype(jnp.int32)
        diag = jnp.roll(d2, 1, axis=1) + mis
        up = jnp.roll(d1, 1, axis=1) + 1
        left = d1 + 1
        dp = jnp.minimum(diag, jnp.minimum(up, left))
        j_vec = k - i_vec
        dp = jnp.where((j_vec == 0) & (i_vec <= w), i_vec, dp)
        dp = jnp.where((i_vec == 0) & (j_vec <= w) & (j_vec >= 0), j_vec, dp)
        valid = ((i_vec >= 0) & (i_vec <= n[:, None]) & (j_vec >= 0)
                 & (j_vec <= m[:, None]) & (jnp.abs(i_vec - j_vec) <= w))
        dp = jnp.where(valid, dp, POS)
        # exactly one cell per diagonal sits on column m: i = k - m
        on_m = valid & (j_vec == m[:, None]) & (dp <= max_ed)
        cell_ed = jnp.max(jnp.where(on_m, max_ed - dp, -1), axis=1)
        has = cell_ed >= 0
        ed = max_ed - cell_ed
        i_here = k - m
        indel = m - i_here  # AlignCandid(dp[i][m], 0, m - i)
        # preference: ed asc, |indel| asc; strict > keeps the earlier
        # (smaller i) on exact ties — candidates arrive in ascending i.
        # Key radix is sized from the static (max_ed, w) so no config can
        # saturate it: ed <= max_ed, |indel| clamped to w + 1.
        key = ((max_ed - ed) * (w + 2)
               + (w + 1 - jnp.minimum(jnp.abs(indel), w + 1)))
        better = has & (key > best_key)
        best_key = jnp.where(better, key, best_key)
        best_ed = jnp.where(better, ed, best_ed)
        best_indel = jnp.where(better, indel, best_indel)
        return (d1, dp, best_key, best_ed, best_indel), None

    ks = jnp.arange(2, 2 * I, dtype=jnp.int32)
    carry = (d2, d1, best_key, best_ed, best_indel)
    (d2, d1, best_key, best_ed, best_indel), _ = jax.lax.scan(
        step, carry, ks)
    return best_ed, best_indel


@partial(jax.jit, static_argnames=("w", "max_ed", "I"))
def edit_end_batch_ref(s, t, n, m, *, w, max_ed, I: int = 128):
    return edit_end_scan_ref(s, t, n, m, w=w, max_ed=max_ed, I=I)


# --------------------------------------------------------------------------
# one-sided banded edit DP, per-item band width (align.cpp:219-252)
# --------------------------------------------------------------------------

def one_side_scan_ref(s: jnp.ndarray, t: jnp.ndarray, n: jnp.ndarray,
                      m: jnp.ndarray, wv: jnp.ndarray, *,
                      I: int) -> jnp.ndarray:
    """Batched global_one_side_banded_alignment: band j - i in [0, w],
    boundary dp[0][j] = j (j <= w), returns dp[n][m] (POS = DPTINF when the
    band never reaches (n, m)).  w is per-item (the middle-gap |diff|).
    Valid when n > w and m > w; callers route the rest to the oracle."""
    B = s.shape[0]
    s_pad = jnp.pad(s, ((0, 0), (0, I - s.shape[1]))).astype(jnp.int8)
    t_pad = jnp.pad(t, ((0, 0), (0, I - t.shape[1]))).astype(jnp.int8)
    t_rev = t_pad[:, ::-1]
    i_vec = jax.lax.broadcasted_iota(jnp.int32, (B, I), 1)

    d2 = jnp.where(i_vec == 0, 0, POS)                       # (0, 0)
    d1 = jnp.where((i_vec == 0) & (wv[:, None] >= 1)
                   & (m[:, None] >= 1), 1, POS)              # (0, 1) only
    out = jnp.full((B,), POS, jnp.int32)
    out = jnp.where((n == 0) & (m == 0), 0, out)
    out = jnp.where((n + m == 1) & (n == 0) & (wv >= 1) & (m == 1), 1, out)

    def step(carry, k):
        d2, d1, out = carry
        mis = _diff_diag(s_pad, t_rev, k, I).astype(jnp.int32)
        diag = jnp.roll(d2, 1, axis=1) + mis
        up = jnp.roll(d1, 1, axis=1) + 1
        left = d1 + 1
        dp = jnp.minimum(diag, jnp.minimum(up, left))
        j_vec = k - i_vec
        dp = jnp.where((i_vec == 0) & (j_vec >= 0)
                       & (j_vec <= jnp.minimum(wv, m)[:, None]), j_vec, dp)
        valid = ((i_vec >= 0) & (i_vec <= n[:, None]) & (j_vec >= i_vec)
                 & (j_vec <= jnp.minimum(i_vec + wv[:, None], m[:, None])))
        dp = jnp.where(valid, dp, POS)
        hit = (k == n + m)
        val = jnp.max(jnp.where(i_vec == n[:, None], dp, -1), axis=1)
        out = jnp.where(hit, val, out)
        return (d1, dp, out), None

    ks = jnp.arange(2, 2 * I, dtype=jnp.int32)
    (d2, d1, out), _ = jax.lax.scan(step, (d2, d1, out), ks)
    return out


@partial(jax.jit, static_argnames=("I",))
def one_side_batch_ref(s, t, n, m, wv, *, I: int = 128):
    return one_side_scan_ref(s, t, n, m, wv, I=I)


# --------------------------------------------------------------------------
# the wave service
# --------------------------------------------------------------------------

class DeviceAlignService:
    """Answers alignment-request waves with batched device dispatches.

    ``solve`` (scalar) delegates to the inline host service — used for the
    rare host-fallback shapes and by sequential drivers.  ``solve_batch``
    groups a wave by kind and runs one device dispatch per kind (chunked at
    a single fixed row count B so each kernel compiles exactly once — a
    fresh shape costs ~20-40 s on the tunneled chip)."""

    I = 128   # padded DP extent; covers reads <= 120 + band
    B = 1024  # fixed dispatch rows (shorter waves pad, longer ones chunk)

    def __init__(self, cfg, sm: al.ScoreMat = None):
        from ..pipeline.extend import InlineAlignService
        self.cfg = cfg
        self.sm = sm if sm is not None else al.ScoreMat()
        self.inline = InlineAlignService(cfg, self.sm)
        self.n_dispatch = 0
        self.n_device = 0
        self.n_host = 0

    def solve(self, req):
        return self.inline.solve(req)

    def solve_batch(self, reqs: List[tuple]) -> List[tuple]:
        out = [None] * len(reqs)
        groups = defaultdict(list)
        for idx, r in enumerate(reqs):
            groups[r[0]].append(idx)
        for kind, idxs in groups.items():
            if kind in ("edit_sc_r", "edit_sc_l"):
                self._solve_edit_sc(kind, idxs, reqs, out)
            elif kind in ("drop_sc_r", "drop_sc_l"):
                self._solve_drop_sc(kind, idxs, reqs, out)
            elif kind in ("end_r", "end_l"):
                self._solve_end(kind, idxs, reqs, out)
            elif kind == "one_side":
                self._solve_one_side(idxs, reqs, out)
            else:
                raise ValueError(f"unknown align request kind {kind!r}")
        return out

    # ---- packing helpers ----
    def _chunks(self, idxs):
        for c0 in range(0, len(idxs), self.B):
            yield idxs[c0:c0 + self.B]

    def _pack(self, idxs, reqs, reverse: bool):
        B = self.B
        s_buf = np.zeros((B, self.I - 1), np.int8)
        t_buf = np.zeros((B, self.I - 1), np.int8)
        n = np.zeros(B, np.int32)
        m = np.zeros(B, np.int32)
        for r, idx in enumerate(idxs):
            s, t = reqs[idx][1], reqs[idx][2]
            if reverse:
                s, t = s[::-1], t[::-1]
            n[r] = len(s)
            m[r] = len(t)
            s_buf[r, :len(s)] = s
            t_buf[r, :len(t)] = t
        return s_buf, t_buf, n, m

    def _split_banded(self, idxs, reqs, out):
        """Route shapes outside the banded regime (oracle falls back to the
        full DP there, align.cpp:397-399) to the scalar host aligner."""
        w = self.cfg.band_width
        dev, host = [], []
        for idx in idxs:
            s, t = reqs[idx][1], reqs[idx][2]
            if len(s) > 2 * w and len(t) > w and len(s) < self.I \
                    and len(t) < self.I:
                dev.append(idx)
            else:
                host.append(idx)
        for idx in host:
            out[idx] = self.inline.solve(reqs[idx])
        self.n_host += len(host)
        self.n_device += len(dev)
        return dev

    # ---- per-kind solvers ----
    def _solve_edit_sc(self, kind, idxs, reqs, out):
        dev = self._split_banded(idxs, reqs, out)
        c = self.cfg
        for chunk in self._chunks(dev):
            s, t, n, m = self._pack(chunk, reqs,
                                    reverse=(kind == "edit_sc_l"))
            ed, sclen, indel, score = edit_sc_batch_ref(
                jnp.asarray(s), jnp.asarray(t), jnp.asarray(n),
                jnp.asarray(m), w=c.band_width, max_ed=c.max_ed,
                max_sc=c.max_sc, I=self.I)
            res = np.asarray(jnp.stack([ed, sclen, indel, score], axis=1))
            self.n_dispatch += 1
            for r, idx in enumerate(chunk):
                out[idx] = (int(res[r, 0]), int(res[r, 1]), int(res[r, 2]),
                            int(res[r, 3]))

    def _solve_drop_sc(self, kind, idxs, reqs, out):
        # the X-drop DP has no small-shape fallback in the oracle; route
        # only over-length inputs (none in practice) to the host
        left = kind == "drop_sc_l"
        dev, host = [], []
        for idx in idxs:
            if len(reqs[idx][1]) < self.I and len(reqs[idx][2]) < self.I:
                dev.append(idx)
            else:
                host.append(idx)
        for idx in host:
            out[idx] = self.inline.solve(reqs[idx])
        self.n_host += len(host)
        self.n_device += len(dev)
        c, sm = self.cfg, self.sm
        for chunk in self._chunks(dev):
            s, t, n, m = self._pack(chunk, reqs, reverse=left)
            score, on_s, on_t = xdrop_batch_ref(
                jnp.asarray(s), jnp.asarray(t), jnp.asarray(n),
                jnp.asarray(m), w=c.band_width, mat=sm.mat, mis=sm.mis,
                ind=sm.ind, xd=sm.xd, I=self.I)
            blob = np.asarray(jnp.stack([score, on_s, on_t], axis=1))
            self.n_dispatch += 1
            ed, sclen, indel, scr = drop_local_sc_batch(
                blob[:, 0], blob[:, 1], blob[:, 2], m, mat=sm.mat,
                mis=sm.mis, w=c.band_width, max_ed=c.max_ed, max_sc=c.max_sc,
                left=left)
            for r, idx in enumerate(chunk):
                out[idx] = (int(ed[r]), int(sclen[r]), int(indel[r]),
                            int(scr[r]))

    def _solve_end(self, kind, idxs, reqs, out):
        dev = self._split_banded(idxs, reqs, out)
        c = self.cfg
        for chunk in self._chunks(dev):
            s, t, n, m = self._pack(chunk, reqs, reverse=(kind == "end_l"))
            ed, indel = edit_end_batch_ref(
                jnp.asarray(s), jnp.asarray(t), jnp.asarray(n),
                jnp.asarray(m), w=c.band_width, max_ed=c.max_ed, I=self.I)
            res = np.asarray(jnp.stack([ed, indel], axis=1))
            self.n_dispatch += 1
            for r, idx in enumerate(chunk):
                out[idx] = (int(res[r, 0]), int(res[r, 1]), -int(res[r, 0]))

    def _solve_one_side(self, idxs, reqs, out):
        dev, host = [], []
        for idx in idxs:
            s, t, w = reqs[idx][1], reqs[idx][2], reqs[idx][3]
            if w >= 0 and len(s) > w and len(t) > w and len(s) < self.I \
                    and len(t) < self.I:
                dev.append(idx)
            else:
                host.append(idx)
        for idx in host:
            out[idx] = self.inline.solve(reqs[idx])
        self.n_host += len(host)
        self.n_device += len(dev)
        for chunk in self._chunks(dev):
            B = self.B
            s_buf = np.zeros((B, self.I - 1), np.int8)
            t_buf = np.zeros((B, self.I - 1), np.int8)
            n = np.zeros(B, np.int32)
            m = np.zeros(B, np.int32)
            wv = np.zeros(B, np.int32)
            for r, idx in enumerate(chunk):
                s, t, w = reqs[idx][1], reqs[idx][2], reqs[idx][3]
                n[r], m[r], wv[r] = len(s), len(t), w
                s_buf[r, :len(s)] = s
                t_buf[r, :len(t)] = t
            edv = one_side_batch_ref(
                jnp.asarray(s_buf), jnp.asarray(t_buf), jnp.asarray(n),
                jnp.asarray(m), jnp.asarray(wv), I=self.I)
            res = np.asarray(jnp.stack([edv, edv], axis=1))[:, 0]
            self.n_dispatch += 1
            for r, idx in enumerate(chunk):
                out[idx] = int(res[r])

    def warm(self):
        """Compile every kernel at the fixed dispatch shape (one compile
        each) so no compile lands inside the streamed region.  Warm
        sequences are length I-1 so every kind stays in the device regime
        (len > 2*band_width) for any valid band width."""
        o = np.ones(self.I - 1, np.int8)
        reqs = [(k, o, o) for k in ("edit_sc_r", "edit_sc_l", "drop_sc_r",
                                    "drop_sc_l", "end_r", "end_l")]
        reqs.append(("one_side", o, o, 1))
        self.solve_batch(reqs)
