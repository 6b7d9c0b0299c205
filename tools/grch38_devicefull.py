#!/usr/bin/env python
"""Run the fused device-full executor on ONE GRCh38-scale contig on the
real chip (VERDICT r4 #4: the flagship scale and the flagship executor
had never met).

Loads contig 0 (~1.03 Gbp, ~1.0 G index entries ~ 10.5 GB at the
10 B/entry device layout) from the round-4 GRCh38 workdir
(tools/grch38_run.py), uploads it plus genome/annotation to the chip,
and maps --n-pairs read pairs through the complete fused program
(lookup -> chain -> k-best -> pairing -> extension walks -> lattice).
Records reads/s, deferral histogram, and device memory stats.

This is a perf/fit probe, not an accuracy gate (reads from other contigs
simply stay unresolved; the full 3-round accuracy gate is
tools/grch38_run.py, which passed in round 4).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    sys.stderr.write(f"[g38full {time.strftime('%H:%M:%S')}] {m}\n")
    sys.stderr.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/grch38_work")
    ap.add_argument("--n-pairs", type=int, default=131072)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--out", default="/tmp/grch38_devicefull.json")
    args = ap.parse_args()
    wd = args.workdir

    from circminer_tpu.config import Config
    from circminer_tpu.io.fasta import GenomePacker
    from circminer_tpu.index.build import load_genome_index, GenomeIndex
    from circminer_tpu.annotation.annotation import AnnotationDB
    from circminer_tpu.io.fastq import read_pairs
    from circminer_tpu.pipeline.device_pipeline import DeviceMappingPipeline
    from circminer_tpu import enable_compilation_cache
    enable_compilation_cache()

    gp = GenomePacker(os.path.join(wd, "ref.fa"))
    info = gp.load_index_info()
    t0 = time.time()
    log("loading contig 0 of the GRCh38 index (npz, lazy per-key)...")
    z = np.load(gp.index_fname + ".npz", allow_pickle=False)
    w = int(z["window_size"])
    cs_len = int(z["checksum_len"])
    from circminer_tpu.index.build import ContigIndex
    codes0 = z["c0_codes"]
    ci0 = ContigIndex(
        name=str(z["c0_name"]), length=codes0.shape[0], codes=codes0,
        entry_hv=z["c0_hv"], entry_checksum=z["c0_checksum"],
        entry_pos=z["c0_pos"])
    gi = GenomeIndex(w, cs_len, [ci0])
    log(f"contig 0: {ci0.codes.shape[0] / 1e9:.2f} Gbp, "
        f"{ci0.entry_hv.shape[0] / 1e9:.2f} G entries "
        f"({time.time() - t0:.0f}s)")

    cfg = Config(kmer=w + cs_len, window_size=w)
    n_contigs = GenomePacker.packed_contig_cnt(info)
    # contig lengths without loading the other contigs' codes: each
    # contig's extent is the max chromosome end in the packed map
    lengths = [0] * n_contigs
    base = min(x.contig_id for x in info)
    for cl in info:
        ci_id = cl.contig_id - base
        lengths[ci_id] = max(lengths[ci_id], cl.end_pos)
    lengths[0] = ci0.codes.shape[0]
    t0 = time.time()
    db = AnnotationDB.from_gtf(
        os.path.join(wd, "ref.gtf"), info, n_contigs, cfg,
        contig_lengths=lengths)
    log(f"GTF loaded ({time.time() - t0:.0f}s)")

    t0 = time.time()
    pipe = DeviceMappingPipeline(db, gi, cfg, batch_size=args.batch,
                                 chain_exec="device-full")
    log(f"pipeline up (device upload enqueued) ({time.time() - t0:.0f}s)")

    import jax
    try:
        ms = jax.devices()[0].memory_stats() or {}
        log(f"device memory after upload: "
            f"{ms.get('bytes_in_use', 0) / 2**30:.2f} GiB in use / "
            f"{ms.get('bytes_limit', 0) / 2**30:.2f} GiB limit")
    except Exception as e:
        ms = {}
        log(f"memory_stats unavailable: {e}")

    pairs = []
    for pr in read_pairs(os.path.join(wd, "R1.fq"),
                         os.path.join(wd, "R2.fq"), cfg):
        pairs.append(pr)
        if len(pairs) >= args.n_pairs:
            break
    log(f"{len(pairs)} pairs loaded")

    t0 = time.time()
    pipe.warmup()
    warm_s = time.time() - t0
    log(f"warmup (compile) {warm_s:.0f}s")

    t0 = time.time()
    n = pipe.map_stream(iter(pairs), contig=0)
    map_s = time.time() - t0
    fs = pipe.full_stats
    from circminer_tpu.config import CONCRD
    n_conc = sum(1 for r1, _ in pairs if r1.mr.type == CONCRD)
    try:
        ms2 = jax.devices()[0].memory_stats() or {}
    except Exception:
        ms2 = {}
    rec = {
        "metric": "grch38_contig0_devicefull_pairs_per_sec",
        "value": round(n / map_s, 1),
        "unit": "pairs/s",
        "n_pairs": n,
        "map_s": round(map_s, 1),
        "warm_s": round(warm_s, 1),
        "conc": n_conc,
        "deferred_pct": round(100.0 * fs["deferred"] / max(1, fs["reads"]),
                              2),
        "defer_causes": fs.get("causes", {}),
        "entries": int(ci0.entry_hv.shape[0]),
        "genome_bp": int(ci0.codes.shape[0]),
        "hbm_gib_in_use": round(ms2.get("bytes_in_use", 0) / 2 ** 30, 2),
        "hbm_gib_limit": round(ms2.get("bytes_limit", 0) / 2 ** 30, 2),
    }
    print(json.dumps(rec))
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    log("done")


if __name__ == "__main__":
    main()
