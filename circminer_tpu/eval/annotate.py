"""Annotate circ_report events with transcripts whose exon boundaries match.

Reference behavior: scripts/annotate_transcript.py — for each event
(chr, spos, epos), find transcripts with an exon starting exactly at spos
AND an exon ending exactly at epos; append ``tid(gene)[begExon-endExon]``
(comma-joined) or ``NA``.
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict
from typing import Dict, List, Tuple

from ..io.gtf import parse_gtf_records


def build_boundary_maps(gtf_path: str):
    """(chr, pos) -> [(tid, gene, exon_number)] for exon begs and ends."""
    beg: Dict[Tuple[str, int], List[Tuple[str, str, str]]] = defaultdict(list)
    end: Dict[Tuple[str, int], List[Tuple[str, str, str]]] = defaultdict(list)
    for rec in parse_gtf_records(gtf_path):
        if rec.feature != "exon":
            continue
        key = (rec.tid, rec.gid, rec.attrs.get("exon_number", "."))
        beg[(rec.chrom, rec.start)].append(key)
        end[(rec.chrom, rec.end)].append(key)
    return beg, end


def annotate_line(line: str, beg, end) -> str:
    t = line.split()
    if not t or t[0] == "chr":
        return line.rstrip("\n") + "\ttranscripts"
    chrom, spos, epos = t[0], int(t[1]), int(t[2])
    starts = {(tid, g): en for tid, g, en in beg.get((chrom, spos), [])}
    ends = {(tid, g): en for tid, g, en in end.get((chrom, epos), [])}
    common = sorted(set(starts) & set(ends))
    if not common:
        return line.rstrip("\n") + "\tNA"
    labels = [f"{tid}({g})[{starts[(tid, g)]}-{ends[(tid, g)]}]"
              for tid, g in common]
    return line.rstrip("\n") + "\t" + ", ".join(labels)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Annotate circ_report with matching transcripts")
    ap.add_argument("report")
    ap.add_argument("gtf")
    ap.add_argument("output")
    args = ap.parse_args(argv)
    beg, end = build_boundary_maps(args.gtf)
    with open(args.report) as fin, open(args.output, "w") as fout:
        for line in fin:
            fout.write(annotate_line(line, beg, end) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
