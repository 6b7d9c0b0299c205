#!/usr/bin/env python
"""Run the Pallas alignment kernels COMPILED (no interpret) on the real TPU
and cross-check against the lax.scan references.

Usage:  python tools/pallas_hw_check.py [--b 4096] [--iters 20]

Appends a result line to HW_NOTES.md so there is a recorded proof of
Mosaic-compiled execution + per-batch timing on hardware (VERDICT r01 #3).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--block-b", type=int, default=512)
    ap.add_argument("--no-notes", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from circminer_tpu.ops import align as al
    from circminer_tpu.ops.pallas_align import (
        xdrop_batch_pallas, xdrop_batch_ref,
        edit_sc_batch_pallas, edit_sc_batch_ref)

    backend = jax.devices()[0].platform
    W, MAX_ED, MAX_SC = 3, 4, 7
    SM = al.ScoreMat()
    rng = np.random.default_rng(99)
    B, I = args.b, 128
    s = rng.integers(0, 4, size=(B, I - 1)).astype(np.int8)
    t = s.copy()
    # mutate ~3% + some unrelated rows
    mut = rng.random((B, I - 1)) < 0.03
    t[mut] = rng.integers(0, 4, size=int(mut.sum()))
    t[:: 7] = rng.integers(0, 4, size=(len(t[::7]), I - 1))
    ns = rng.integers(2 * W + 1, I - 1, size=B).astype(np.int32)
    ms = rng.integers(W + 1, I - 1, size=B).astype(np.int32)

    js, jt = jnp.asarray(s), jnp.asarray(t)
    jn, jm = jnp.asarray(ns), jnp.asarray(ms)

    results = {}
    for name, pallas_fn, ref_fn, kw in (
        ("xdrop", xdrop_batch_pallas, xdrop_batch_ref,
         dict(w=W, mat=SM.mat, mis=SM.mis, ind=SM.ind, xd=SM.xd)),
        ("edit_sc", edit_sc_batch_pallas, edit_sc_batch_ref,
         dict(w=W, max_ed=MAX_ED, max_sc=MAX_SC)),
    ):
        # compiled pallas (interpret NOT set)
        out_p = pallas_fn(js, jt, jn, jm, block_b=args.block_b, **kw)
        jax.block_until_ready(out_p)
        out_r = ref_fn(js, jt, jn, jm, **kw)
        jax.block_until_ready(out_r)
        for a, b in zip(out_p, out_r):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        t0 = time.time()
        for _ in range(args.iters):
            out_p = pallas_fn(js, jt, jn, jm, block_b=args.block_b, **kw)
        jax.block_until_ready(out_p)
        dt_p = (time.time() - t0) / args.iters

        t0 = time.time()
        for _ in range(args.iters):
            out_r = ref_fn(js, jt, jn, jm, **kw)
        jax.block_until_ready(out_r)
        dt_r = (time.time() - t0) / args.iters
        results[name] = (dt_p, dt_r)
        print(f"[pallas_hw_check] {name}: backend={backend} B={B} "
              f"pallas={dt_p*1e3:.2f}ms ref={dt_r*1e3:.2f}ms "
              f"({B/dt_p/1e6:.2f} M aligns/s pallas) — outputs MATCH")

    if not args.no_notes:
        import datetime
        stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "HW_NOTES.md")
        newfile = not os.path.exists(path)
        with open(path, "a") as f:
            if newfile:
                f.write("# Hardware notes — compiled-kernel runs on the "
                        "real chip\n\n")
            f.write(f"- {stamp} backend={backend} B={B} block_b="
                    f"{args.block_b} Mosaic-compiled (interpret=False): ")
            f.write("; ".join(
                f"{k}: pallas {v[0]*1e3:.2f} ms/batch vs lax.scan "
                f"{v[1]*1e3:.2f} ms/batch" for k, v in results.items()))
            f.write(" — bit-equal to scan refs\n")
        print(f"[pallas_hw_check] recorded in {path}")


if __name__ == "__main__":
    main()
