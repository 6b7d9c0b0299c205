"""Batched hybrid mapping pipeline: host C++ seeding, device chain DP.

The per-read orchestration (extension, categories) stays on host; the chain
DP — the branchy O(lists^2 * occ^2) hot loop (filter.cpp:470-482,
chain.cpp:73-301) — runs as a fixed-shape batched device kernel over whole
read blocks, 4 orientations at once (R1 fwd, R1 rc, R2 fwd, R2 rc).

Seed lookup is a memory-latency pointer workload (hash -> bucket -> checksum
bisect) that the host does in ~20 ms/batch via the native C++ kernels
(ops/seed_native.py), so the index stays in host RAM and only the dense seed
tensors ship to the device.  A pure-device lookup (ops/seed.py) remains for
HBM-resident-index deployments (and is what the multi-chip sharded step
uses), but XLA's giant-table gathers are pathological on current TPU
runtimes, so the hybrid split is the default executor.

Latency design (the TPU here sits behind a tunnel where every dispatch pays
an RTT and small fetches are latency-bound):
  - one fused chain-DP dispatch per occupancy bucket, fetching a single
    concatenated (dp10 | back) tensor; seed positions stay host-side so the
    fetch is 8*NL bytes/row/cap instead of the full seed tensor,
  - batches are software-pipelined two deep: while the host runs extension
    and category logic for batch i, the device is already chaining batch
    i+1.
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
from ..utils.timing import GLOBAL_TIMER as T
from .mapping import Mapper, ReadRecord


@dataclasses.dataclass
class ContigDeviceState:
    anno: AnnoDevice
    seeder: object  # NativeSeeder (or numpy fallback)


@partial(jax.jit, static_argnames=("k", "max_ed", "max_intron", "seg_pad"))
def _chain_dp(pos, cnt, qpos, lens,
              nb_bits, iv_spos, iv_epos, iv_max_end, iv_min_end,
              iv_max_next, iv_nseg, seg_end, seg_next,
              *, k, max_ed, max_intron, seg_pad):
    """Chain DP on pre-gathered seeds; one concatenated int32 output
    [R, NL, 2*cap] = (dp10 | back) for a single fetch."""
    dp10, back = chain_batch_device(
        pos, cnt, qpos, lens,
        nb_bits, iv_spos, iv_epos, iv_max_end, iv_min_end,
        iv_max_next, iv_nseg, seg_end, seg_next,
        k=k, max_ed=max_ed, max_intron=max_intron, seg_pad=seg_pad)
    return jnp.concatenate([dp10, back], axis=-1)


def _numpy_seeder(ci, cfg):
    """Pure-numpy batched lookup fallback when the C++ library is absent."""
    class _Np:
        def __init__(self):
            self.entry_pos = ci.entry_pos

        def lookup(self, reads, lens):
            from ..ops.seed import lookup_read_host
            B = reads.shape[0]
            NL = cfg.n_kmer_lists
            qpos = np.full((B, NL), -1, np.int32)
            start = np.zeros((B, NL), np.int32)
            cnt = np.zeros((B, NL), np.int32)
            high = np.zeros(B, np.int32)
            for b in range(B):
                h = lookup_read_host(reads[b, :lens[b]], ci, cfg)
                qpos[b] = h.qpos[::2][:NL]
                start[b] = h.start[::2][:NL]
                cnt[b] = h.count[::2][:NL]
                high[b] = int(h.high_hit[::2][:NL].sum())
            return qpos, start, cnt, high

        def gather(self, start, cnt, cap):
            R, NL = start.shape
            pos = np.zeros((R, NL, cap), np.int32)
            ep = ci.entry_pos
            for r in range(R):
                for s in range(NL):
                    c = min(int(cnt[r, s]), cap)
                    if c > 0:
                        st = int(start[r, s])
                        pos[r, s, :c] = ep[st:st + c]
            return pos
    return _Np()


class DeviceMappingPipeline:
    """chain_exec selects the chaining executor:
      - "native": multithreaded C++ chain DP on host (default — measured
        fastest on tunneled single-chip backends where each dispatch pays an
        RTT and XLA's large-table ops underperform),
      - "device": batched jax chain DP on the accelerator (the HBM-resident
        design used by the multi-chip sharded step).
    """

    def __init__(self, db, gi, cfg: Config, batch_size: int = 4096,
                 seg_pad: int = 16, chain_exec: str = "native"):
        self.db = db
        self.gi = gi
        self.cfg = cfg
        self.batch = batch_size
        self.seg_pad = seg_pad
        if chain_exec == "native":
            from ..ops.chain_native import available
            if not available():
                chain_exec = "device"
        self.chain_exec = chain_exec
        self.states: List[ContigDeviceState] = []
        self.mappers: List[Mapper] = []
        self.chainers: List[object] = []
        for c, ci in enumerate(gi.contigs):
            anno = (AnnoDevice.from_contig(db.contigs[c], seg_pad=seg_pad)
                    if chain_exec == "device" else None)
            try:
                from ..ops.seed_native import NativeSeeder
                seeder = NativeSeeder(ci, cfg)
            except Exception:
                seeder = _numpy_seeder(ci, cfg)
            self.states.append(ContigDeviceState(anno=anno, seeder=seeder))
            self.mappers.append(Mapper(db, c, ci.codes, cfg, seeder=None))
            if chain_exec == "native":
                from ..ops.chain_native import NativeChainer
                self.chainers.append(NativeChainer(db.contigs[c], cfg))
            else:
                self.chainers.append(None)
        # native per-read finish engine (extension + categories in C++);
        # None -> python orchestration fallback
        self.filters = []
        for c, ci in enumerate(gi.contigs):
            try:
                from ..ops.filter_native import NativeFilter
                self.filters.append(NativeFilter(db, c, ci.codes, cfg))
            except Exception:
                self.filters.append(None)
        self.n_lists = cfg.n_kmer_lists

    # ---- stage 1: encode + host lookup ----
    def dispatch_lookup(self, recs, contig: int):
        cfg = self.cfg
        st = self.states[contig]
        n = len(recs)
        L = cfg.max_read_len
        with T.phase("encode"):
            seqs = np.zeros((4 * n, L), dtype=np.int8)
            lens = np.zeros(4 * n, dtype=np.int32)
            for i, (r1, r2) in enumerate(recs):
                for o, s in enumerate((r1.seq, r1.rcseq, r2.seq, r2.rcseq)):
                    seqs[4 * i + o, :len(s)] = s
                    lens[4 * i + o] = len(s)
        with T.phase("host_lookup"):
            qpos, start, cnt, high = st.seeder.lookup(seqs, lens)
        return dict(recs=recs, contig=contig, qpos=qpos, start=start,
                    cnt=cnt, high=high, lens=lens, seqs=seqs)

    # ---- stage 2: bucket by occupancy, gather, dispatch chain DP ----
    def dispatch_chain(self, lf):
        if self.chain_exec == "native":
            return self._chain_native(lf)
        cfg = self.cfg
        st = self.states[lf["contig"]]
        ad = st.anno
        cnt_h = lf["cnt"]
        maxocc = cnt_h.max(axis=1) if cnt_h.shape[1] > 0 else \
            np.zeros(len(cnt_h), np.int32)
        buckets = []
        prev = 0
        pos_cache = {}
        for cap in self._caps():
            rows = np.nonzero((maxocc <= cap) & (maxocc > prev))[0] \
                if prev else np.nonzero(maxocc <= cap)[0]
            prev = cap
            if len(rows) == 0:
                continue
            chunk = self._chunk_for(cap)
            for c0 in range(0, len(rows), chunk):
                sub = rows[c0:c0 + chunk]
                R = len(sub)
                with T.phase(f"gather_cap{cap}"):
                    pos_b = st.seeder.gather(
                        lf["start"][sub], np.minimum(cnt_h[sub], cap), cap)
                if R < chunk:  # pad to the compiled shape
                    pos_p = np.zeros((chunk,) + pos_b.shape[1:], np.int32)
                    pos_p[:R] = pos_b
                    cnt_p = np.zeros((chunk, cnt_h.shape[1]), np.int32)
                    cnt_p[:R] = cnt_h[sub]
                    qpos_p = np.zeros((chunk, cnt_h.shape[1]), np.int32)
                    qpos_p[:R] = np.maximum(lf["qpos"][sub], 0)
                    lens_p = np.zeros(chunk, np.int32)
                    lens_p[:R] = lf["lens"][sub]
                else:
                    pos_p = pos_b
                    cnt_p = cnt_h[sub]
                    qpos_p = np.maximum(lf["qpos"][sub], 0)
                    lens_p = lf["lens"][sub]
                with T.phase(f"chain_dispatch_cap{cap}"):
                    fut = _chain_dp(
                        jnp.asarray(pos_p), jnp.asarray(cnt_p),
                        jnp.asarray(qpos_p), jnp.asarray(lens_p),
                        ad.nb_bits, ad.iv_spos, ad.iv_epos, ad.iv_max_end,
                        ad.iv_min_end, ad.iv_max_next, ad.iv_nseg,
                        ad.seg_end, ad.seg_next,
                        k=cfg.kmer, max_ed=cfg.max_ed,
                        max_intron=cfg.max_intron, seg_pad=ad.seg_pad)
                buckets.append((sub, cap, pos_b, fut))
        return dict(recs=lf["recs"], contig=lf["contig"], buckets=buckets,
                    cnt=cnt_h, qpos=np.maximum(lf["qpos"], 0),
                    hh=lf["high"])

    def _chain_native(self, lf):
        """Host path: gather + multithreaded C++ chain DP, occupancy-bucketed
        so the dense [R, NL, cap] seed tensor stays small for typical rows."""
        cfg = self.cfg
        st = self.states[lf["contig"]]
        chainer = self.chainers[lf["contig"]]
        cnt_h = lf["cnt"]
        qpos_h = np.maximum(lf["qpos"], 0)
        maxocc = cnt_h.max(axis=1) if cnt_h.shape[1] > 0 else \
            np.zeros(len(cnt_h), np.int32)
        parts = []
        prev = 0
        for cap in self._caps():
            rows = np.nonzero((maxocc <= cap) & (maxocc > prev))[0] \
                if prev else np.nonzero(maxocc <= cap)[0]
            prev = cap
            if len(rows) == 0:
                continue
            with T.phase(f"gather_cap{cap}"):
                pos_b = st.seeder.gather(
                    lf["start"][rows], np.minimum(cnt_h[rows], cap), cap)
            with T.phase(f"chain_native_cap{cap}"):
                rp, qp, cl, sc, n = chainer.chain_batch(
                    pos_b, cnt_h[rows], qpos_h[rows], lf["lens"][rows])
            parts.append((rows, rp, qp, cl, sc, n))
        return dict(recs=lf["recs"], contig=lf["contig"], parts=parts,
                    cnt=cnt_h, qpos=qpos_h, hh=lf["high"], native=True,
                    seqs=lf["seqs"], lens=lf["lens"])

    # ---- stage 3: fetch chains, run host mapping ----
    def finish(self, cf) -> None:
        if cf.get("native"):
            return self._finish_native(cf)
        cfg = self.cfg
        recs = cf["recs"]
        n = len(recs)
        cnt_h, qpos_h, hh_h = cf["cnt"], cf["qpos"], cf["hh"]
        dp_out = [None] * (4 * n)
        back_out = [None] * (4 * n)
        pos_out = [None] * (4 * n)
        for rows, cap, pos_b, fut in cf["buckets"]:
            with T.phase(f"chain_fetch_cap{cap}"):
                fut.block_until_ready()
                blob = np.asarray(fut)  # [Rp, NL, 2*cap]
            dp10 = blob[:, :, :cap]
            back = blob[:, :, cap:]
            for ri, r in enumerate(rows):
                dp_out[r] = dp10[ri]
                back_out[r] = back[ri]
                pos_out[r] = pos_b[ri]
        mapper = self.mappers[cf["contig"]]
        with T.phase("host_finish"):
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

    def _finish_native(self, cf) -> None:
        from ..ops.chain_native import NativeChainer
        cfg = self.cfg
        recs = cf["recs"]
        n = len(recs)
        hh_h = cf["hh"]
        k = cfg.kmer
        nf = self.filters[cf["contig"]]
        if nf is not None:
            # fully native finish: extension + pairing + categories in C++
            from ..ops.filter_native import NativeFilter
            R = 4 * n
            C = cfg.max_chain_len
            NL = self.n_lists
            with T.phase("filter_assemble"):
                rp_f = np.zeros((R, C, NL), np.int32)
                qp_f = np.zeros((R, C, NL), np.int32)
                cl_f = np.zeros((R, C), np.int32)
                sc_f = np.zeros((R, C), np.float64)
                cn_f = np.zeros(R, np.int32)
                for rows, rp, qp, cl, sc, cn in cf["parts"]:
                    rp_f[rows] = rp
                    qp_f[rows] = qp
                    cl_f[rows] = cl
                    sc_f[rows] = sc
                    cn_f[rows] = cn
                mr_state = np.ascontiguousarray(np.stack([
                    NativeFilter.mr_to_state(r1.mr, nf.chr_names)
                    for r1, _ in recs]))
            with T.phase("filter_native"):
                nf.filter_pe(cf["seqs"], cf["lens"], rp_f, qp_f, cl_f, sc_f,
                             cn_f, hh_h, mr_state)
            with T.phase("filter_writeback"):
                for i, (r1, _) in enumerate(recs):
                    NativeFilter.state_to_mr(mr_state[i], r1.mr,
                                             nf.chr_names)
            return
        chains_out = [None] * (4 * n)
        for rows, rp, qp, cl, sc, cn in cf["parts"]:
            for ri, r in enumerate(rows):
                chains_out[r] = (rp[ri], qp[ri], cl[ri], sc[ri], cn[ri])
        mapper = self.mappers[cf["contig"]]
        with T.phase("host_finish"):
            for i, (r1, r2) in enumerate(recs):
                if cfg.scan_level == 0 and r1.mr.type == CONCRD:
                    continue
                quad = []
                for o in range(4):
                    r = 4 * i + o
                    rp, qp, cl, sc, cn = chains_out[r]
                    chains = NativeChainer.to_chains(rp, qp, cl, sc, cn, k)
                    quad.append((chains, int(hh_h[r])))
                mapper.process_read_pe(r1, r2, tuple(quad))

    def _caps(self):
        caps = [c for c in self.cfg.seed_buckets if c <= self.cfg.seed_lim]
        if not caps or caps[-1] < self.cfg.seed_lim:
            caps = list(caps) + [self.cfg.seed_lim]
        return caps

    def _chunk_for(self, cap: int) -> int:
        """Row-chunk size keeping the DP working set bounded; the transition
        tensor peaks at [chunk, cap, NL, cap] int32."""
        if cap <= 16:
            return 4 * self.batch
        if cap <= 128:
            return 2048
        return 128

    # ---- full stream mapping with 2-deep software pipelining ----
    def map_stream(self, pairs: Iterable[Tuple[ReadRecord, ReadRecord]],
                   out=None, remain=None, conloc=None,
                   contig: int = 0) -> int:
        cfg = self.cfg
        n_total = 0

        def batches():
            buf = []
            for pr in pairs:
                buf.append(pr)
                if len(buf) >= self.batch:
                    yield buf
                    buf = []
            if buf:
                yield buf

        gen = batches()
        pending_chain = None  # chain-dispatched, host work not done
        nxt = next(gen, None)
        if nxt is not None:
            lf = self.dispatch_lookup(nxt, contig)
        while nxt is not None:
            cf = self.dispatch_chain(lf)
            upcoming = next(gen, None)
            if upcoming is not None:
                lf = self.dispatch_lookup(upcoming, contig)  # overlaps device
            if pending_chain is not None:
                self._finalize(pending_chain, out, remain, conloc)
                n_total += len(pending_chain["recs"])
            pending_chain = cf
            nxt = upcoming
        if pending_chain is not None:
            self._finalize(pending_chain, out, remain, conloc)
            n_total += len(pending_chain["recs"])
        return n_total

    def map_stream_all_contigs(self, pairs, out=None, remain=None,
                               conloc=None) -> int:
        """Multi-contig mapping: one pass per contig over the materialized
        pair list, carrying best-so-far state in MatchedRead (the TPU
        replacement for the reference's per-contig remain-FASTQ rounds,
        circminer.cpp:229-308)."""
        pair_list = list(pairs)
        for contig in range(len(self.states)):
            if self.cfg.scan_level == 0 and contig > 0:
                todo = [pr for pr in pair_list if pr[0].mr.type != CONCRD]
            else:
                todo = pair_list
            if todo:
                self.map_stream(iter(todo), out=None, remain=None,
                                conloc=None, contig=contig)
        # emit once, after every contig has had its shot
        for r1, r2 in pair_list:
            if out is not None and out.fmt:
                if out.fmt == "pam":
                    out.write_pam_pe(r1, r2)
                else:
                    out.write_sam_pe(r1, r2)
            if remain is not None and r1.mr.type in (CHIBSJ, CHI2BSJ):
                remain.write(r1, r2, r1.mr, conloc)
        return len(pair_list)

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
        """Execute every (cap, chunk) bucket shape so no compile lands inside
        the streamed region.  No-op in native mode (nothing to compile)."""
        if self.chain_exec == "native":
            return
        cfg = self.cfg
        st = self.states[0]
        ad = st.anno
        NL = self.n_lists
        for cap in self._caps():
            chunk = self._chunk_for(cap)
            out = _chain_dp(
                jnp.zeros((chunk, NL, cap), jnp.int32),
                jnp.zeros((chunk, NL), jnp.int32),
                jnp.zeros((chunk, NL), jnp.int32),
                jnp.full((chunk,), cfg.max_read_len, jnp.int32),
                ad.nb_bits, ad.iv_spos, ad.iv_epos, ad.iv_max_end,
                ad.iv_min_end, ad.iv_max_next, ad.iv_nseg, ad.seg_end,
                ad.seg_next, k=cfg.kmer, max_ed=cfg.max_ed,
                max_intron=cfg.max_intron, seg_pad=ad.seg_pad)
            out.block_until_ready()
