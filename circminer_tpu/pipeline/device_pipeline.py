"""Batched TPU mapping pipeline.

The per-read orchestration (extension, categories) stays on host, but the
two seed-side hot loops — index lookup and chain DP — run as fixed-shape
batched device kernels over whole read blocks, 4 orientations at once
(R1 fwd, R1 rc, R2 fwd, R2 rc), replacing the reference's per-read pointer
chasing (filter.cpp:470-482) with gathers and masked tensor ops.

Reads are bucketed by max seed occupancy so the chain DP's [B, S, M]
working set stays small for the (vast) majority of reads while repeat-heavy
reads still get the full seed_lim width.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, CONCRD, CHIBSJ, CHI2BSJ
from ..annotation.device import AnnoDevice
from ..ops.chain import chain_batch_device, extract_kbest, Chain
from ..ops.seed import lookup_batch_device, gather_seeds_device
from .mapping import Mapper, ReadRecord, make_host_seeder


@dataclasses.dataclass
class ContigDeviceState:
    bucket_start: jnp.ndarray
    entry_checksum: jnp.ndarray
    entry_pos: jnp.ndarray
    anno: AnnoDevice


class DeviceMappingPipeline:
    def __init__(self, db, gi, cfg: Config, batch_size: int = 512,
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
        # non-overlapping k-mer lists for the padded read length
        self.n_lists = (cfg.max_read_len + cfg.kmer - 1) // cfg.kmer

    # ---- device stage: 4-orientation seed lookup + chain DP ----
    def chains_for_batch(self, recs: List[Tuple[ReadRecord, ReadRecord]],
                         contig: int):
        """Returns per pair: ((fc1,hh),(bc1,hh),(fc2,hh),(bc2,hh))."""
        cfg = self.cfg
        st = self.states[contig]
        n = len(recs)
        L = cfg.max_read_len
        seqs = np.zeros((4 * n, L), dtype=np.int8)
        lens = np.zeros(4 * n, dtype=np.int32)
        for i, (r1, r2) in enumerate(recs):
            for o, s in enumerate((r1.seq, r1.rcseq, r2.seq, r2.rcseq)):
                seqs[4 * i + o, :len(s)] = s
                lens[4 * i + o] = len(s)

        n_slots = cfg.max_seg_cnt
        qpos_d, start_d, cnt_d, hh_d = lookup_batch_device(
            jnp.asarray(seqs), jnp.asarray(lens), st.bucket_start,
            st.entry_checksum, k=cfg.kmer, cs_len=cfg.checksum_len,
            n_slots=n_slots, seed_lim=cfg.seed_lim)
        cnt_h = np.asarray(cnt_d)
        hh_h = np.asarray(hh_d)
        qpos_h = np.asarray(qpos_d)

        # compact even slots -> NL lists
        NL = self.n_lists
        sl = slice(0, 2 * NL, 2)
        cnt_c = cnt_h[:, sl]
        qpos_c = np.maximum(qpos_h[:, sl], 0)
        start_c = np.asarray(start_d)[:, sl]
        hh_counts = hh_h[:, sl].sum(axis=1)

        # bucket rows by max occupancy; pad each bucket to a multiple of 128
        # so the jit cache sees a handful of shapes only
        maxocc = cnt_c.max(axis=1) if NL > 0 else np.zeros(4 * n, np.int32)
        ad = st.anno
        dp_out = [None] * (4 * n)
        back_out = [None] * (4 * n)
        pos_out = [None] * (4 * n)
        caps = self._caps()
        prev = 0
        for cap in caps:
            rows = np.nonzero((maxocc <= cap) & (maxocc > prev))[0] \
                if prev else np.nonzero(maxocc <= cap)[0]
            prev = cap
            if len(rows) == 0:
                continue
            R = len(rows)
            Rp = -(-R // 128) * 128
            pad = np.concatenate([rows, np.zeros(Rp - R, dtype=rows.dtype)])
            cnt_pad = cnt_c[pad].copy()
            cnt_pad[R:] = 0
            pos_d, _ = gather_seeds_device(
                st.entry_pos, jnp.asarray(start_c[pad]),
                jnp.asarray(cnt_pad), cap=cap)
            pos_b = np.asarray(pos_d)  # [Rp, NL, cap]
            dp10, back = chain_batch_device(
                jnp.asarray(pos_b), jnp.asarray(cnt_pad),
                jnp.asarray(qpos_c[pad]), jnp.asarray(lens[pad]),
                ad.nb_bits, ad.iv_spos, ad.iv_epos, ad.iv_max_end,
                ad.iv_min_end, ad.iv_max_next, ad.iv_nseg, ad.seg_end,
                ad.seg_next, k=cfg.kmer, max_ed=cfg.max_ed,
                max_intron=cfg.max_intron, seg_pad=ad.seg_pad)
            dp10 = np.asarray(dp10)
            back = np.asarray(back)
            for ri, r in enumerate(rows):
                dp_out[r] = dp10[ri]
                back_out[r] = back[ri]
                pos_out[r] = pos_b[ri]

        out = []
        for i in range(n):
            quad = []
            for o in range(4):
                r = 4 * i + o
                chains = extract_kbest(dp_out[r], back_out[r], pos_out[r],
                                       qpos_c[r], cnt_c[r], cfg)
                quad.append((chains, int(hh_counts[r])))
            out.append(((quad[0][0], quad[0][1]), (quad[1][0], quad[1][1]),
                        (quad[2][0], quad[2][1]), (quad[3][0], quad[3][1])))
        return out

    def _caps(self):
        caps = [c for c in self.cfg.seed_buckets if c <= self.cfg.seed_lim]
        if not caps or caps[-1] < self.cfg.seed_lim:
            caps = list(caps) + [self.cfg.seed_lim]
        return caps

    def _prev_cap(self, cap):
        caps = self._caps()
        i = caps.index(cap)
        return 0 if i == 0 else caps[i - 1]

    # ---- full stream mapping ----
    def map_stream(self, pairs: Iterable[Tuple[ReadRecord, ReadRecord]],
                   out=None, remain=None, conloc=None) -> int:
        cfg = self.cfg
        n_total = 0
        batch: List[Tuple[ReadRecord, ReadRecord]] = []

        def flush():
            nonlocal n_total
            if not batch:
                return
            for contig in range(len(self.states)):
                quads = self.chains_for_batch(batch, contig)
                for (r1, r2), quad in zip(batch, quads):
                    if cfg.scan_level == 0 and r1.mr.type == CONCRD:
                        continue
                    self.mappers[contig].process_read_pe(r1, r2, quad)
            for r1, r2 in batch:
                if out is not None and out.fmt:
                    if out.fmt == "pam":
                        out.write_pam_pe(r1, r2)
                    else:
                        out.write_sam_pe(r1, r2)
                if remain is not None and r1.mr.type in (CHIBSJ, CHI2BSJ):
                    remain.write(r1, r2, r1.mr, conloc)
                n_total += 1
            batch.clear()

        for pr in pairs:
            batch.append(pr)
            if len(batch) >= self.batch:
                flush()
        flush()
        return n_total
