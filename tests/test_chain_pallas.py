"""Parity: chain_batch_pallas (VMEM-blocked Pallas DP core) must be
bit-identical to chain_batch_device (same _chain_dp_core by construction;
this pins the blocking/padding plumbing)."""

import numpy as np
import pytest

from circminer_tpu.ops.chain import chain_batch_device, chain_batch_pallas


def _mk(seed, B=64, NL=6, S=16, G=200_000, n_iv=32, P=4):
    rng = np.random.default_rng(seed)
    pos = np.sort(rng.integers(1, G, size=(B, NL, S)), axis=2).astype(
        np.int32)
    cnt = rng.integers(0, S + 1, size=(B, NL)).astype(np.int32)
    qpos = (np.arange(NL, dtype=np.int32) * 20)[None, :].repeat(B, 0).copy()
    lens = np.full(B, 100, np.int32)
    nb = rng.integers(0, 256, size=G // 8 + 2).astype(np.uint8)
    iv_spos = np.sort(rng.integers(1, G, n_iv)).astype(np.int32)
    iv_epos = (iv_spos + rng.integers(50, 500, n_iv)).astype(np.int32)
    seg_end = (iv_epos[:, None] +
               rng.integers(0, 300, (n_iv, P))).astype(np.int32)
    seg_next = (seg_end + rng.integers(50, 5000, (n_iv, P))).astype(np.int32)
    iv_nseg = rng.integers(0, P + 1, n_iv).astype(np.int32)
    iv_max_end = seg_end.max(axis=1).astype(np.int32)
    iv_min_end = seg_end.min(axis=1).astype(np.int32)
    iv_max_next = seg_next.max(axis=1).astype(np.int32)
    return (pos, cnt, qpos, lens, nb, iv_spos, iv_epos, iv_max_end,
            iv_min_end, iv_max_next, iv_nseg, seg_end, seg_next)


@pytest.mark.parametrize("seed,B,block_b", [(0, 64, 32), (1, 50, 16),
                                            (2, 128, 128)])
def test_pallas_chain_matches_device(seed, B, block_b):
    args = _mk(seed, B=B)
    kw = dict(k=20, max_ed=4, max_intron=2_000_000, seg_pad=4)
    dp0, bk0 = chain_batch_device(*args, **kw)
    dp1, bk1 = chain_batch_pallas(*args, **kw, block_b=block_b,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(dp0), np.asarray(dp1))
    np.testing.assert_array_equal(np.asarray(bk0), np.asarray(bk1))
