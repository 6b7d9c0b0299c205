"""Multi-chip scaling: data-parallel read sharding over a device mesh.

The reference scales with pthreads over shared memory (circminer.cpp:285-297)
and has no distributed story.  The TPU-native design (SURVEY §5): reads are
sharded data-parallel across chips ("dp" axis), the genome index and
annotation arrays are replicated into each chip's HBM (they fit for
single-contig genomes; index sharding with all-to-all seed exchange is the
fallback for full GRCh38), and the small per-shard BSJ candidate lists are
merged with an all-gather at the end so host 0 can write one deterministic
circ_report.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ..config import Config


def make_mesh(n_devices: int = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_reads(mesh: Mesh, arr: jnp.ndarray) -> jnp.ndarray:
    """Shard a [B, ...] read-batch array along dp."""
    spec = P("dp", *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, arr: jnp.ndarray) -> jnp.ndarray:
    return jax.device_put(arr, NamedSharding(mesh, P()))


def make_sharded_map_step(mesh: Mesh, cfg: Config, *, k: int, cs_len: int,
                          n_slots: int, seed_lim: int, seg_pad: int,
                          seed_cap: int):
    """Jitted full mapping device step over the mesh:

    reads [B, L] (sharded dp) x index/annotation (replicated) ->
      (dp10, back, seed positions, high-hit counts) all sharded dp,
      plus an all-reduced total-seed-count scalar (exercises the collective
      path that the BSJ merge uses).
    """
    from ..ops.seed import lookup_batch_device, gather_seeds_device
    from ..ops.chain import chain_batch_device

    NL = (cfg.max_read_len + k - 1) // k

    def step(reads, lens, bucket_start, entry_checksum, entry_pos,
             nb_bits, iv_spos, iv_epos, iv_max_end, iv_min_end,
             iv_max_next, iv_nseg, seg_end, seg_next):
        qpos_d, start_d, cnt_d, hh_d = lookup_batch_device(
            reads, lens, bucket_start, entry_checksum,
            k=k, cs_len=cs_len, n_slots=n_slots, seed_lim=seed_lim)
        sl = slice(0, 2 * NL, 2)
        cnt_c = cnt_d[:, sl]
        qpos_c = jnp.maximum(qpos_d[:, sl], 0)
        start_c = start_d[:, sl]
        pos_b, _ = gather_seeds_device(entry_pos, start_c, cnt_c,
                                       cap=seed_cap)
        dp10, back = chain_batch_device(
            pos_b, cnt_c, qpos_c, lens,
            nb_bits, iv_spos, iv_epos, iv_max_end, iv_min_end,
            iv_max_next, iv_nseg, seg_end, seg_next,
            k=k, max_ed=cfg.max_ed, max_intron=cfg.max_intron,
            seg_pad=seg_pad)
        total_seeds = jnp.sum(cnt_c)
        return dp10, back, pos_b, hh_d.sum(axis=1), total_seeds

    in_spec = (P("dp", None), P("dp"),
               P(), P(), P(), P(), P(), P(), P(), P(), P(), P(),
               P(None, None), P(None, None))
    out_spec = (P("dp", None, None), P("dp", None, None),
                P("dp", None, None), P("dp"), P())

    from jax.experimental.shard_map import shard_map

    def wrapped(*args):
        def inner(*a):
            dp10, back, pos_b, hh, tot = step(*a)
            tot = jax.lax.psum(tot, "dp")
            return dp10, back, pos_b, hh, tot
        return shard_map(inner, mesh=mesh, in_specs=in_spec,
                         out_specs=out_spec, check_rep=False)(*args)

    return jax.jit(wrapped)


def merge_bsj_candidates(mesh: Mesh, cand: jnp.ndarray,
                         count: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                      jnp.ndarray]:
    """All-gather per-shard (spos, epos) candidate arrays so every host sees
    the full set; the final grouping/sort happens on host 0
    (replaces the reference's single-process GNU sort,
    process_circ.cpp:179-193)."""
    from jax.experimental.shard_map import shard_map

    def inner(c, n):
        cg = jax.lax.all_gather(c, "dp", axis=0, tiled=False)
        ng = jax.lax.all_gather(n, "dp", axis=0, tiled=False)
        return cg, ng

    return jax.jit(shard_map(
        inner, mesh=mesh,
        in_specs=(P("dp", None), P("dp")),
        out_specs=(P(None, None, None), P(None, None)),
        check_rep=False))(cand, count)
