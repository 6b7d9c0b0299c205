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
