"""Convert a UCSC-style GTF (exon/CDS records only) to Ensembl style.

Reference behavior: scripts/convertGTF.py — synthesize a ``transcript``
record per transcript_id spanning min(exon start)..max(exon end), and a
``gene`` record per gene_id spanning its transcripts, preserving original
records.  Output is ordered gene -> its transcripts -> their exons, in
first-encounter order.
"""

from __future__ import annotations

import argparse
import sys
from collections import OrderedDict

from ..io.gtf import parse_gtf_records


def convert(in_path: str, out_path: str) -> None:
    genes = OrderedDict()   # gid -> {tid -> [GtfRecord]}
    has_tr = set()
    has_gene = set()
    for rec in parse_gtf_records(in_path):
        if rec.feature == "gene":
            has_gene.add(rec.gid)
        elif rec.feature == "transcript":
            has_tr.add(rec.tid)
        genes.setdefault(rec.gid, OrderedDict()) \
             .setdefault(rec.tid, []).append(rec)

    def fmt(rec, feature, start, end, gid, tid) -> str:
        attrs = f'gene_id "{gid}";'
        if feature != "gene":
            attrs += f' transcript_id "{tid}";'
        return (f"{rec.chrom}\t{rec.source}\t{feature}\t{start}\t{end}"
                f"\t.\t{rec.strand}\t.\t{attrs}")

    def raw(rec) -> str:
        a = "; ".join(f'{k} "{v}"' for k, v in rec.attrs.items())
        return (f"{rec.chrom}\t{rec.source}\t{rec.feature}\t{rec.start}\t"
                f"{rec.end}\t.\t{rec.strand}\t.\t{a};")

    with open(out_path, "w") as out:
        for gid, trs in genes.items():
            all_recs = [r for recs in trs.values() for r in recs]
            exons = [r for r in all_recs if r.feature == "exon"] or all_recs
            g_start = min(r.start for r in exons)
            g_end = max(r.end for r in exons)
            if gid not in has_gene:
                out.write(fmt(exons[0], "gene", g_start, g_end, gid, "")
                          + "\n")
            for tid, recs in trs.items():
                t_exons = [r for r in recs if r.feature == "exon"] or recs
                body = [r for r in recs
                        if r.feature not in ("gene", "transcript")]
                if not tid:
                    for r in body:
                        out.write(raw(r) + "\n")
                    continue
                if tid not in has_tr:
                    out.write(fmt(t_exons[0], "transcript",
                                  min(r.start for r in t_exons),
                                  max(r.end for r in t_exons), gid, tid)
                              + "\n")
                else:
                    for r in recs:
                        if r.feature == "transcript":
                            out.write(raw(r) + "\n")
                for r in body:
                    out.write(raw(r) + "\n")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="UCSC-style GTF -> Ensembl-style GTF")
    ap.add_argument("input")
    ap.add_argument("output")
    args = ap.parse_args(argv)
    convert(args.input, args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
