"""Diff two circ_reports: events gained/lost + support-read set diffs.

Reference behavior: scripts/compare_multiple_tools/diff.cpp — for events
present in both reports (keyed by chr/spos/epos), print the support reads
only in A (``A-B``) and only in B (``B-A``); list events unique to each
report.
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, List, Tuple


def load_report_reads(path: str) -> Dict[Tuple[str, int, int],
                                         Tuple[int, List[str]]]:
    """(chr, spos, epos) -> (support, [read names]).  The read list is the
    final comma-separated column of a circ_report line."""
    out = {}
    with open(path) as f:
        for line in f:
            t = line.split()
            if not t or t[0] == "chr":
                continue
            key = (t[0], int(t[1]), int(t[2]))
            reads = t[-1].split(",") if "," in t[-1] or t[-1][:1].isalnum() \
                else []
            out[key] = (int(t[3]), [r for r in reads if r])
    return out


def diff(a_path: str, b_path: str, out=sys.stdout) -> dict:
    a = load_report_reads(a_path)
    b = load_report_reads(b_path)
    common = sorted(set(a) & set(b))
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    for key in common:
        sa, ra = a[key]
        sb, rb = b[key]
        a_b = sorted(set(ra) - set(rb)) or ["-"]
        b_a = sorted(set(rb) - set(ra)) or ["-"]
        out.write(f"{key[0]}\t{key[1]}\t{key[2]}\t{sa}\t{sb}\t"
                  f"{','.join(a_b)}\t{','.join(b_a)}\n")
    for key in only_a:
        out.write(f"{key[0]}\t{key[1]}\t{key[2]}\t{a[key][0]}\t.\tA-only\n")
    for key in only_b:
        out.write(f"{key[0]}\t{key[1]}\t{key[2]}\t.\t{b[key][0]}\tB-only\n")
    return {"common": len(common), "only_a": len(only_a),
            "only_b": len(only_b)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Diff two circ_reports")
    ap.add_argument("report_a")
    ap.add_argument("report_b")
    args = ap.parse_args(argv)
    import json
    print(json.dumps(diff(args.report_a, args.report_b)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
