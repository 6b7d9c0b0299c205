"""Normalize CIRI-style circRNA output for cross-tool comparison.

Reference behavior: scripts/circ_simulation_eval/convert_ciri.py — CIRI2's
output carries junction reads embedded in decorated columns; extract the
BSJ / RO read-name lists and append counts.  This version also emits the
normalized 4-column (chr, start, end, support) TSV that circ_compare
consumes.
"""

from __future__ import annotations

import argparse
import re
import sys

_BSJ_STRIP = re.compile(r"<.*?::")
_PAREN = re.compile(r"\(.*?\)")
_RO_STRIP = re.compile(r"##.*?&&")


def _clean(parts):
    return [p for p in parts if p and p != "n/a"]


def extract_bsj_reads(col: str):
    s = _BSJ_STRIP.sub("", col)
    s = _PAREN.sub("$", s)
    s = s.replace(">", "$")
    return _clean(s.split("$"))


def extract_ro_reads(col: str):
    return _clean(_RO_STRIP.sub("$", col).split("$"))


def normalize(in_path: str, out=sys.stdout, tsv: bool = False) -> int:
    """tsv=True: only chr/start/end/unique-support columns."""
    n = 0
    with open(in_path) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            if not t or t[0] in ("BSJ", "circRNA_ID"):
                if not tsv:
                    out.write(line)
                continue
            # CIRI2 columns: id, chr, start, end, #junction_reads, SM_MS_SMS,
            # #non_junction, junction_reads_ratio, ..., junction_reads_ID
            if len(t) >= 9 and ":" in t[0]:
                chrom, start, end = t[1], t[2], t[3]
                bsj_reads = extract_bsj_reads(t[7]) if "<" in t[7] else []
                ro_reads = extract_ro_reads(t[8]) if "&&" in t[8] else []
                uniq = set(bsj_reads + ro_reads)
                support = len(uniq) if uniq else int(t[4])
            else:  # already chr start end support
                chrom, start, end = t[0], t[1], t[2]
                support = int(t[3]) if len(t) > 3 else 0
                bsj_reads, ro_reads, uniq = [], [], set()
            if tsv:
                out.write(f"{chrom}\t{start}\t{end}\t{support}\n")
            else:
                out.write(line.rstrip("\n") +
                          f"\t{len(bsj_reads)}\t{len(ro_reads)}\t"
                          f"{len(uniq)}\n")
            n += 1
    return n


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Normalize CIRI output")
    ap.add_argument("input")
    ap.add_argument("--tsv", action="store_true",
                    help="emit chr/start/end/support TSV only")
    args = ap.parse_args(argv)
    normalize(args.input, tsv=args.tsv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
