"""Batched TPU mapping pipeline.

The per-read orchestration (extension, categories) stays on host, but the
two seed-side hot loops — index lookup and chain DP — run as fixed-shape
batched device kernels over whole read blocks, 4 orientations at once
(R1 fwd, R1 rc, R2 fwd, R2 rc), replacing the reference's per-read pointer
chasing (filter.cpp:470-482) with gathers and masked tensor ops.

Latency design (the TPU here sits behind a tunnel where every blocking fetch
pays an RTT):
  - lookup outputs stay device-resident; only a packed (cnt, hh) array is
    fetched to drive occupancy bucketing,
  - gather + chain DP run as ONE fused dispatch per bucket with row
    selection on device, outputs concatenated for a single fetch,
  - batches are software-pipelined two deep: while the host runs extension
    and category logic for batch i, the device is already chaining
    batch i+1.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, CONCRD, CHIBSJ, CHI2BSJ
from ..annotation.device import AnnoDevice
from ..ops.chain import chain_batch_device, extract_kbest, Chain
from ..ops.seed import lookup_batch_device
from .mapping import Mapper, ReadRecord


@dataclasses.dataclass
class ContigDeviceState:
    bucket_start: jnp.ndarray
    entry_checksum: jnp.ndarray
    entry_pos: jnp.ndarray
    anno: AnnoDevice


@partial(jax.jit, static_argnames=("k", "cs_len", "n_slots", "seed_lim",
                                  "n_lists"))
def _lookup_packed(reads, lens, bucket_start, entry_checksum, *, k, cs_len,
                   n_slots, seed_lim, n_lists):
    """Lookup + compact even slots; returns device-resident
    (start[B,NL], cnt[B,NL], qpos[B,NL]) plus packed [B, NL+1] (cnt, hh)."""
    qpos_d, start_d, cnt_d, hh_d = lookup_batch_device(
        reads, lens, bucket_start, entry_checksum,
        k=k, cs_len=cs_len, n_slots=n_slots, seed_lim=seed_lim)
    sl = slice(0, 2 * n_lists, 2)
    cnt_c = cnt_d[:, sl]
    qpos_c = jnp.maximum(qpos_d[:, sl], 0)
    start_c = start_d[:, sl]
    hh_c = hh_d[:, sl].sum(axis=1).astype(jnp.int32)
    packed = jnp.concatenate([cnt_c, hh_c[:, None]], axis=1)
    return start_c, cnt_c, qpos_c, packed


@partial(jax.jit, static_argnames=("cap", "k", "max_ed", "max_intron",
                                  "seg_pad"))
def _chain_rows(entry_pos, start_c, cnt_c, qpos_c, lens, rows, row_valid,
                nb_bits, iv_spos, iv_epos, iv_max_end, iv_min_end,
                iv_max_next, iv_nseg, seg_end, seg_next,
                *, cap, k, max_ed, max_intron, seg_pad):
    """Row-select on device, gather seeds, run chain DP; one concatenated
    int32 output [R, NL, 3*cap] = (pos | dp10 | back) for a single fetch."""
    start_r = start_c[rows]
    cnt_r = jnp.where(row_valid[:, None], cnt_c[rows], 0)
    qpos_r = qpos_c[rows]
    lens_r = lens[rows]
    offs = jnp.arange(cap, dtype=jnp.int32)
    idx = jnp.clip(start_r[..., None] + offs, 0, entry_pos.shape[0] - 1)
    pos = jnp.where(offs < cnt_r[..., None], entry_pos[idx].astype(jnp.int32),
                    0)
    dp10, back = chain_batch_device(
        pos, cnt_r, qpos_r, lens_r,
        nb_bits, iv_spos, iv_epos, iv_max_end, iv_min_end,
        iv_max_next, iv_nseg, seg_end, seg_next,
        k=k, max_ed=max_ed, max_intron=max_intron, seg_pad=seg_pad)
    return jnp.concatenate([pos, dp10, back], axis=-1)


class DeviceMappingPipeline:
    def __init__(self, db, gi, cfg: Config, batch_size: int = 4096,
                 seg_pad: int = 16):
        self.db = db
        self.gi = gi
        self.cfg = cfg
        self.batch = batch_size
        self.seg_pad = seg_pad
        self.states: List[ContigDeviceState] = []
        self.mappers: List[Mapper] = []
        for c, ci in enumerate(gi.contigs):
            anno = AnnoDevice.from_contig(db.contigs[c], seg_pad=seg_pad)
            self.states.append(ContigDeviceState(
                bucket_start=jax.device_put(jnp.asarray(ci.bucket_start)),
                entry_checksum=jax.device_put(jnp.asarray(ci.entry_checksum)),
                entry_pos=jax.device_put(jnp.asarray(ci.entry_pos)),
                anno=anno))
            self.mappers.append(Mapper(db, c, ci.codes, cfg, seeder=None))
        self.n_lists = (cfg.max_read_len + cfg.kmer - 1) // cfg.kmer

    # ---- stage 1: encode + dispatch lookup ----
    def dispatch_lookup(self, recs, contig: int):
        cfg = self.cfg
        st = self.states[contig]
        n = len(recs)
        L = cfg.max_read_len
        # always the full batch shape: a cold compile of the lookup program
        # for a new shape costs minutes on this backend, so the final
        # partial batch is padded with empty rows instead
        nb = self.batch
        seqs = np.zeros((4 * nb, L), dtype=np.int8)
        lens = np.zeros(4 * nb, dtype=np.int32)
        for i, (r1, r2) in enumerate(recs):
            for o, s in enumerate((r1.seq, r1.rcseq, r2.seq, r2.rcseq)):
                seqs[4 * i + o, :len(s)] = s
                lens[4 * i + o] = len(s)
        lens_d = jnp.asarray(lens)
        start_c, cnt_c, qpos_c, packed = _lookup_packed(
            jnp.asarray(seqs), lens_d, st.bucket_start, st.entry_checksum,
            k=cfg.kmer, cs_len=cfg.checksum_len, n_slots=cfg.max_seg_cnt,
            seed_lim=cfg.seed_lim, n_lists=self.n_lists)
        return dict(recs=recs, contig=contig, start=start_c, cnt=cnt_c,
                    qpos=qpos_c, packed=packed, lens=lens_d)

    # ---- stage 2: fetch occupancy, dispatch fused gather+chain ----
    def dispatch_chain(self, lf):
        cfg = self.cfg
        st = self.states[lf["contig"]]
        ad = st.anno
        packed = np.asarray(lf["packed"])[: 4 * len(lf["recs"])]
        NL = self.n_lists
        cnt_h = packed[:, :NL]
        hh_h = packed[:, NL]
        maxocc = cnt_h.max(axis=1) if NL > 0 else np.zeros(len(cnt_h),
                                                           np.int32)
        buckets = []
        prev = 0
        for cap in self._caps():
            rows = np.nonzero((maxocc <= cap) & (maxocc > prev))[0] \
                if prev else np.nonzero(maxocc <= cap)[0]
            prev = cap
            if len(rows) == 0:
                continue
            # fixed chunk size per cap: exactly one compiled shape per
            # bucket, and bounded [chunk, cap, NL*cap] working set
            chunk = self._chunk_for(cap)
            for c0 in range(0, len(rows), chunk):
                sub = rows[c0:c0 + chunk]
                R = len(sub)
                pad = np.concatenate(
                    [sub, np.zeros(chunk - R, dtype=np.int64)]) \
                    if R < chunk else sub
                row_valid = np.zeros(chunk, dtype=bool)
                row_valid[:R] = True
                fut = _chain_rows(
                    st.entry_pos, lf["start"], lf["cnt"], lf["qpos"],
                    lf["lens"], jnp.asarray(pad.astype(np.int32)),
                    jnp.asarray(row_valid),
                    ad.nb_bits, ad.iv_spos, ad.iv_epos, ad.iv_max_end,
                    ad.iv_min_end, ad.iv_max_next, ad.iv_nseg, ad.seg_end,
                    ad.seg_next, cap=cap, k=cfg.kmer, max_ed=cfg.max_ed,
                    max_intron=cfg.max_intron, seg_pad=ad.seg_pad)
                buckets.append((sub, cap, fut))
        qpos_h = np.asarray(lf["qpos"])
        return dict(recs=lf["recs"], contig=lf["contig"], buckets=buckets,
                    cnt=cnt_h, qpos=qpos_h, hh=hh_h)

    # ---- stage 3: fetch chains, run host mapping ----
    def finish(self, cf) -> None:
        cfg = self.cfg
        recs = cf["recs"]
        n = len(recs)
        NL = self.n_lists
        cnt_h, qpos_h, hh_h = cf["cnt"], cf["qpos"], cf["hh"]
        dp_out = [None] * (4 * n)
        back_out = [None] * (4 * n)
        pos_out = [None] * (4 * n)
        for rows, cap, fut in cf["buckets"]:
            blob = np.asarray(fut)  # [Rp, NL, 3*cap]
            pos_b = blob[:, :, :cap]
            dp10 = blob[:, :, cap:2 * cap]
            back = blob[:, :, 2 * cap:]
            for ri, r in enumerate(rows):
                dp_out[r] = dp10[ri]
                back_out[r] = back[ri]
                pos_out[r] = pos_b[ri]
        mapper = self.mappers[cf["contig"]]
        for i, (r1, r2) in enumerate(recs):
            if cfg.scan_level == 0 and r1.mr.type == CONCRD:
                continue
            quad = []
            for o in range(4):
                r = 4 * i + o
                chains = extract_kbest(dp_out[r], back_out[r], pos_out[r],
                                       qpos_h[r], cnt_h[r], cfg)
                quad.append((chains, int(hh_h[r])))
            mapper.process_read_pe(r1, r2, tuple(quad))

    def _caps(self):
        caps = [c for c in self.cfg.seed_buckets if c <= self.cfg.seed_lim]
        if not caps or caps[-1] < self.cfg.seed_lim:
            caps = list(caps) + [self.cfg.seed_lim]
        return caps

    def _chunk_for(self, cap: int) -> int:
        """Row-chunk size keeping the DP working set ~hundreds of MB."""
        if cap <= 16:
            return 4 * self.batch
        if cap <= 128:
            return 1024
        return 64

    # ---- full stream mapping with 2-deep software pipelining ----
    def map_stream(self, pairs: Iterable[Tuple[ReadRecord, ReadRecord]],
                   out=None, remain=None, conloc=None) -> int:
        cfg = self.cfg
        n_total = 0
        n_contigs = len(self.states)

        def batches():
            buf = []
            for pr in pairs:
                buf.append(pr)
                if len(buf) >= self.batch:
                    yield buf
                    buf = []
            if buf:
                yield buf

        for contig in range(n_contigs):
            if contig > 0:
                raise NotImplementedError(
                    "multi-contig streaming handled by CLI round loop")

        gen = batches()
        pending_chain = None  # chain-dispatched, host work not done
        nxt = next(gen, None)
        if nxt is not None:
            lf = self.dispatch_lookup(nxt, 0)
        while nxt is not None:
            cf = self.dispatch_chain(lf)       # fetches occupancy only
            upcoming = next(gen, None)
            if upcoming is not None:
                lf = self.dispatch_lookup(upcoming, 0)  # overlaps device
            if pending_chain is not None:
                self._finalize(pending_chain, out, remain, conloc)
                n_total += len(pending_chain["recs"])
            pending_chain = cf
            nxt = upcoming
        if pending_chain is not None:
            self._finalize(pending_chain, out, remain, conloc)
            n_total += len(pending_chain["recs"])
        return n_total

    def _finalize(self, cf, out, remain, conloc):
        self.finish(cf)
        for r1, r2 in cf["recs"]:
            if out is not None and out.fmt:
                if out.fmt == "pam":
                    out.write_pam_pe(r1, r2)
                else:
                    out.write_sam_pe(r1, r2)
            if remain is not None and r1.mr.type in (CHIBSJ, CHI2BSJ):
                remain.write(r1, r2, r1.mr, conloc)

    def warmup(self):
        """Execute every (cap, chunk) bucket shape plus the lookup shape so
        no compile lands inside the streamed region.

        The chain inputs MUST come from a real _lookup_packed call: feeding
        hand-made dense arrays compiles a different executable (input
        layouts differ) and the real one would still compile — slowly,
        server-side — at the first streamed batch."""
        cfg = self.cfg
        st = self.states[0]
        ad = st.anno
        B = 4 * self.batch
        NL = self.n_lists
        lens = jnp.full((B,), cfg.max_read_len, jnp.int32)
        reads = jnp.zeros((B, cfg.max_read_len), jnp.int8)
        start, cnt, qpos, packed = _lookup_packed(
            reads, lens, st.bucket_start, st.entry_checksum,
            k=cfg.kmer, cs_len=cfg.checksum_len,
            n_slots=cfg.max_seg_cnt, seed_lim=cfg.seed_lim, n_lists=NL)
        packed.block_until_ready()
        for cap in self._caps():
            chunk = self._chunk_for(cap)
            rows = jnp.zeros(chunk, jnp.int32)
            rv = jnp.zeros(chunk, bool)
            out = _chain_rows(
                st.entry_pos, start, cnt, qpos, lens, rows, rv,
                ad.nb_bits, ad.iv_spos, ad.iv_epos, ad.iv_max_end,
                ad.iv_min_end, ad.iv_max_next, ad.iv_nseg, ad.seg_end,
                ad.seg_next, cap=cap, k=cfg.kmer, max_ed=cfg.max_ed,
                max_intron=cfg.max_intron, seg_pad=ad.seg_pad)
            out.block_until_ready()
