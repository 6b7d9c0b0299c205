"""Device-resident annotation arrays for the chain DP gates.

The chain DP needs three annotation queries per seed cell
(gene_annotation.h:123-133, chain.cpp:28-64):
  - near_border bit at the seed position,
  - the disjoint exon interval containing it (+ max/min end aggregates),
  - the interval's segment list (end, next_exon_beg) for junction checks.

All are fixed-shape arrays here: the packed bitmask, sorted interval bounds
for vectorized bisection, and seg lists padded to ``seg_pad`` per interval.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .annotation import ContigAnnotation


@dataclasses.dataclass
class AnnoDevice:
    nb_bits: jnp.ndarray     # uint8 packed near_border bitmask
    iv_spos: jnp.ndarray     # int32[NIV]
    iv_epos: jnp.ndarray
    iv_max_end: jnp.ndarray
    iv_min_end: jnp.ndarray
    iv_max_next: jnp.ndarray
    iv_nseg: jnp.ndarray     # int32[NIV] actual seg count (<= seg_pad kept)
    seg_end: jnp.ndarray     # int32[NIV, seg_pad]
    seg_next: jnp.ndarray    # int32[NIV, seg_pad]
    seg_pad: int
    overflowed: bool         # some interval had more segs than seg_pad

    @classmethod
    def from_contig(cls, ca: ContigAnnotation, seg_pad: int = 16) -> "AnnoDevice":
        n_iv = ca.n_intervals
        nseg = (ca.iv_seg_off[1:] - ca.iv_seg_off[:-1]).astype(np.int32)
        overflow = bool((nseg > seg_pad).any())
        seg_end = np.zeros((n_iv, seg_pad), dtype=np.int32)
        seg_next = np.zeros((n_iv, seg_pad), dtype=np.int32)
        for iv in range(n_iv):
            a = int(ca.iv_seg_off[iv])
            m = min(int(nseg[iv]), seg_pad)
            seg_end[iv, :m] = ca.seg_end[a:a + m]
            seg_next[iv, :m] = ca.seg_next[a:a + m]
        return cls(
            nb_bits=jnp.asarray(ca.near_border.bits),
            iv_spos=jnp.asarray(ca.iv_spos.astype(np.int64).clip(0, 2**31 - 1).astype(np.int32)),
            iv_epos=jnp.asarray(ca.iv_epos.astype(np.int64).clip(0, 2**31 - 1).astype(np.int32)),
            iv_max_end=jnp.asarray(ca.iv_max_end.astype(np.int64).clip(0, 2**31 - 1).astype(np.int32)),
            iv_min_end=jnp.asarray(ca.iv_min_end.astype(np.int64).clip(0, 2**31 - 1).astype(np.int32)),
            iv_max_next=jnp.asarray(ca.iv_max_next.astype(np.int64).clip(0, 2**31 - 1).astype(np.int32)),
            iv_nseg=jnp.asarray(np.minimum(nseg, seg_pad)),
            seg_end=jnp.asarray(seg_end),
            seg_next=jnp.asarray(seg_next),
            seg_pad=seg_pad,
            overflowed=overflow,
        )


def near_border_bit(nb_bits: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Vectorized near_border lookup (pos 1-based int32)."""
    p = jnp.clip(pos, 0, nb_bits.shape[0] * 8 - 1)
    byte = nb_bits[p >> 3]
    return ((byte >> (p & 7).astype(jnp.uint8)) & 1).astype(jnp.bool_)


@dataclasses.dataclass
class FinishAnnoDevice:
    """Extra device-resident annotation for the fused mapping finish
    (ops/device_full.py): pair gating, category lattice and tlen walks.

    Shapes mirror the host accessors exactly so the fold logic can
    reproduce utils.cpp:53-320 enumeration order:
      - iv_tids:   per interval, seg-major transcript list with duplicates
                   (AnnotationDB.interval_tids order), -1 padded,
      - seg_*_p:   per interval padded segment attributes (iv_seg_off CSR
                   flattened like AnnoDevice.seg_end),
      - t2s:       trans2seg CSR (flat states + int32 offsets),
      - shifts:    contig->chromosome shift table (io/fasta.get_shift).
    """
    iv_tids: jnp.ndarray       # int32[NIV, ST_PAD], -1 pad
    iv_ntid: jnp.ndarray       # int32[NIV] true count (may exceed ST_PAD)
    iv_nseg_true: jnp.ndarray  # int32[NIV] unclipped seg count
    seg_start_p: jnp.ndarray   # int32[NIV, seg_pad]
    seg_gene_p: jnp.ndarray    # int32[NIV, seg_pad]
    gene_start: jnp.ndarray    # int32[NG]
    gene_end: jnp.ndarray      # int32[NG]
    intr_bits: jnp.ndarray     # uint8 packed intronic bitmask
    trans_start: jnp.ndarray   # int32[NT]
    t2s_off: jnp.ndarray       # int32[NT + 1]
    t2s_state: jnp.ndarray     # uint8 flat
    shift_bounds: jnp.ndarray  # int32[NS] ascending shift boundaries
    shift_vals: jnp.ndarray    # int32[NS] shift to subtract
    st_pad: int

    @classmethod
    def from_contig(cls, ca: ContigAnnotation, con2chr_list,
                    seg_pad: int = 16, st_pad: int = 16
                    ) -> "FinishAnnoDevice":
        n_iv = ca.n_intervals
        iv_tids = np.full((n_iv, st_pad), -1, dtype=np.int32)
        iv_ntid = np.zeros(n_iv, dtype=np.int32)
        seg_start_p = np.zeros((n_iv, seg_pad), dtype=np.int32)
        seg_gene_p = np.full((n_iv, seg_pad), -1, dtype=np.int32)
        for iv in range(n_iv):
            a, b = int(ca.iv_seg_off[iv]), int(ca.iv_seg_off[iv + 1])
            m = min(b - a, seg_pad)
            seg_start_p[iv, :m] = ca.seg_start[a:a + m]
            seg_gene_p[iv, :m] = ca.seg_gene[a:a + m]
            tids = []
            for e in range(a, b):
                u = int(ca.seg_uid[e])
                if u >= 0:
                    tids.extend(ca.uid_tid[ca.uid_tid_off[u]:
                                           ca.uid_tid_off[u + 1]])
            iv_ntid[iv] = len(tids)
            iv_tids[iv, :min(len(tids), st_pad)] = tids[:st_pad]
        nseg_true = (ca.iv_seg_off[1:] - ca.iv_seg_off[:-1]).astype(np.int32)
        return cls(
            iv_tids=jnp.asarray(iv_tids),
            iv_ntid=jnp.asarray(iv_ntid),
            iv_nseg_true=jnp.asarray(nseg_true),
            seg_start_p=jnp.asarray(seg_start_p),
            seg_gene_p=jnp.asarray(seg_gene_p),
            gene_start=jnp.asarray(np.asarray(ca.gene_start, np.int64)
                                   .clip(0, 2**31 - 1).astype(np.int32)),
            gene_end=jnp.asarray(np.asarray(ca.gene_end, np.int64)
                                 .clip(0, 2**31 - 1).astype(np.int32)),
            intr_bits=jnp.asarray(ca.intronic.bits),
            trans_start=jnp.asarray(ca.trans_start_ind.astype(np.int32)),
            t2s_off=jnp.asarray(ca.t2s_off.astype(np.int32)),
            t2s_state=jnp.asarray(ca.t2s_state),
            shift_bounds=jnp.asarray(
                np.array([cs.shift for cs in con2chr_list], np.int64)
                .clip(0, 2**31 - 1).astype(np.int32)),
            shift_vals=jnp.asarray(
                np.array([cs.shift for cs in con2chr_list], np.int64)
                .clip(0, 2**31 - 1).astype(np.int32)),
            st_pad=st_pad,
        )


# Register the annotation bundles as pytrees so jitted programs can take
# them whole (leaves = arrays; static aux = pad sizes / flags).
def _ad_flatten(ad: AnnoDevice):
    leaves = (ad.nb_bits, ad.iv_spos, ad.iv_epos, ad.iv_max_end,
              ad.iv_min_end, ad.iv_max_next, ad.iv_nseg, ad.seg_end,
              ad.seg_next)
    return leaves, (ad.seg_pad, ad.overflowed)


def _ad_unflatten(aux, leaves):
    return AnnoDevice(*leaves, seg_pad=aux[0], overflowed=aux[1])


def _fa_flatten(fa: FinishAnnoDevice):
    leaves = (fa.iv_tids, fa.iv_ntid, fa.iv_nseg_true, fa.seg_start_p,
              fa.seg_gene_p, fa.gene_start, fa.gene_end, fa.intr_bits,
              fa.trans_start, fa.t2s_off, fa.t2s_state, fa.shift_bounds,
              fa.shift_vals)
    return leaves, (fa.st_pad,)


def _fa_unflatten(aux, leaves):
    return FinishAnnoDevice(*leaves, st_pad=aux[0])


jax.tree_util.register_pytree_node(AnnoDevice, _ad_flatten, _ad_unflatten)
jax.tree_util.register_pytree_node(FinishAnnoDevice, _fa_flatten,
                                   _fa_unflatten)
