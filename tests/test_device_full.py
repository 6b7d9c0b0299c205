"""device-full fused executor == host native pipeline, bit-exact.

Every read is either finished on device (defer bit 0) or replayed through
the host path; both must leave identical MatchedRead state.  The test
compares the device-full pipeline against the pure native pipeline on the
same simulated library (linear + circular + junk reads).
"""
import numpy as np
import pytest

from circminer_tpu.config import Config, CATEGORY_NAMES
from circminer_tpu.sim import make_genome, simulate_reads
from circminer_tpu.io.fasta import GenomePacker
from circminer_tpu.index.build import build_genome_index
from circminer_tpu.annotation.annotation import AnnotationDB
from circminer_tpu.pipeline.device_pipeline import DeviceMappingPipeline
from circminer_tpu.pipeline.mapping import ReadRecord
from circminer_tpu.pipeline.types import MatchedRead
from circminer_tpu.ops.encode import encode_seq, revcomp

FIELDS = ("type", "spos_r1", "epos_r1", "qspos_r1", "qepos_r1", "mlen_r1",
          "ed_r1", "r1_forward", "spos_r2", "epos_r2", "qspos_r2",
          "qepos_r2", "mlen_r2", "ed_r2", "r2_forward", "tlen", "junc_num",
          "gm_compatible", "chr_r1", "contig_num")


def make_pairs(reads, cfg):
    out = []
    for r in reads:
        s1, s2 = encode_seq(r.r1), encode_seq(r.r2)
        out.append((ReadRecord(r.name, s1, revcomp(s1), "I" * len(r.r1),
                               len(r.r1), MatchedRead.default(cfg.max_ed)),
                    ReadRecord(r.name, s2, revcomp(s2), "I" * len(r.r2),
                               len(r.r2), None)))
    return out


@pytest.mark.parametrize("err", [0.0, 0.01])
def test_device_full_matches_native(tmp_path, err):
    rng = np.random.default_rng(int(err * 1000) + 3)
    g = make_genome(rng, length=80_000, n_genes=4)
    ref = str(tmp_path / "ref.fa")
    gtf = str(tmp_path / "ref.gtf")
    g.write_fasta(ref)
    g.write_gtf(gtf)
    cfg = Config(kmer=20, max_read_len=100)
    gp = GenomePacker(ref)
    contigs, info = gp.pack_genome()
    gi = build_genome_index(contigs, cfg)
    db = AnnotationDB.from_gtf(gtf, info, 1, cfg,
                               contig_lengths=[len(c) for c in contigs])
    reads, _ = simulate_reads(rng, g, 60, 30, read_len=100, err_rate=err)
    # junk reads exercise the NOPROC/OEA paths
    junk = []
    for i in range(8):
        s = "".join(rng.choice(list("ACGT"), 100))
        junk.append(type(reads[0])(f"junk{i}", s,
                                   reads[0].r2 if i % 2 else
                                   "".join(rng.choice(list("ACGT"), 100)),
                                   None, None))

    pairs_a = make_pairs(reads, cfg) + make_pairs(junk, cfg)
    pairs_b = make_pairs(reads, cfg) + make_pairs(junk, cfg)

    pn = DeviceMappingPipeline(db, gi, cfg, batch_size=64,
                               chain_exec="native")
    pn.map_stream(iter(pairs_a))

    pf = DeviceMappingPipeline(db, gi, cfg, batch_size=64,
                               chain_exec="device-full")
    pf.warmup()
    pf.map_stream(iter(pairs_b))

    n_def = pf.full_stats["deferred"]
    n_tot = pf.full_stats["reads"]
    bad = 0
    for (a1, _), (b1, _) in zip(pairs_a, pairs_b):
        for f in FIELDS:
            va, vb = getattr(a1.mr, f), getattr(b1.mr, f)
            if va != vb:
                bad += 1
                print(f"{a1.rname}: {f} native={va} full={vb} "
                      f"(type {CATEGORY_NAMES[a1.mr.type]} vs "
                      f"{CATEGORY_NAMES[b1.mr.type]})")
                break
    assert bad == 0, f"{bad} mismatching reads (deferred {n_def}/{n_tot})"
    # the device must genuinely handle most of the batch
    assert n_def < 0.5 * n_tot, f"deferred {n_def}/{n_tot}"
