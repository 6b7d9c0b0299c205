"""Per-read mapping accuracy: PAM vs. ground truth.

Reference behavior: scripts/evaluation/eval.cpp + cigar.cpp (CIGAR-walking
interval comparison of CircMiner PAM vs. an ART/simulator ground-truth SAM)
and evaluate.py (bucketing reads by mapping class).  Two truth sources:

- a ground-truth SAM: each mate's true intervals are reconstructed by
  walking its CIGAR; a PAM mapping is correct when its [spos, epos] overlaps
  the union of the true intervals on the same chromosome for both mates.
- this repo's simulation read names (``L<i>`` linear / ``C<i>`` circular),
  scoring category assignment (CONCRD vs. CHIBSJ/CHI2BSJ).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from typing import Dict, List, Tuple

from ..config import CONCRD, CHIORF, CHIBSJ, CHI2BSJ, CATEGORY_NAMES

_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def cigar_intervals(pos: int, cigar: str) -> List[Tuple[int, int]]:
    """Reference-consuming intervals [start, end] (1-based inclusive) of an
    alignment, splitting on N (skipped region / intron).  eval.cpp's
    cigar-walk equivalent."""
    ivals = []
    cur = pos
    seg_start = pos
    for n, op in _CIGAR_RE.findall(cigar):
        n = int(n)
        if op in "M=XD":
            cur += n
        elif op == "N":
            if cur > seg_start:
                ivals.append((seg_start, cur - 1))
            cur += n
            seg_start = cur
        # I, S, H, P consume no reference
    if cur > seg_start:
        ivals.append((seg_start, cur - 1))
    return ivals


def load_truth_sam(path: str) -> Dict[str, List[Tuple[str, int, int]]]:
    """read name -> [(chrom, start, end)] true intervals over all records."""
    truth: Dict[str, List[Tuple[str, int, int]]] = {}
    with open(path) as f:
        for line in f:
            if line.startswith("@"):
                continue
            t = line.split("\t")
            name, flag, chrom, pos, cigar = (t[0], int(t[1]), t[2],
                                             int(t[3]), t[5])
            if flag & 4 or chrom == "*" or cigar == "*":
                continue
            for s, e in cigar_intervals(pos, cigar):
                truth.setdefault(name, []).append((chrom, s, e))
    return truth


def _overlaps(chrom, s, e, ivals) -> bool:
    return any(c == chrom and s <= ie and e >= is_
               for c, is_, ie in ivals)


def score_pam_vs_sam(pam_path: str, truth: Dict) -> dict:
    """Fraction of PAM-mapped pairs whose both mates land on a true
    interval."""
    n = correct = mapped = 0
    with open(pam_path) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            n += 1
            if t[1] == "*":
                continue
            mapped += 1
            name = t[0]
            ivals = truth.get(name, [])
            ok1 = _overlaps(t[1], int(t[2]), int(t[3]), ivals)
            ok2 = _overlaps(t[9], int(t[10]), int(t[11]), ivals)
            correct += ok1 and ok2
    return {"reads": n, "mapped": mapped, "correct": correct,
            "mapped_frac": round(mapped / n, 4) if n else 0.0,
            "precision": round(correct / mapped, 4) if mapped else 0.0}


def score_pam_vs_sim(pam_path: str) -> dict:
    """Category accuracy against L*/C* simulation names: linear reads should
    be concordant-class (type <= CHIORF), circular BSJ reads CHIBSJ/CHI2BSJ."""
    buckets: Dict[str, Dict[str, int]] = {
        "linear": {"total": 0, "expected": 0},
        "circ": {"total": 0, "expected": 0},
    }
    by_cat: Dict[str, int] = {}
    with open(pam_path) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            cat = int(t[-1])
            by_cat[CATEGORY_NAMES[cat]] = by_cat.get(
                CATEGORY_NAMES[cat], 0) + 1
            if t[0].startswith("L"):
                buckets["linear"]["total"] += 1
                buckets["linear"]["expected"] += cat <= CHIORF
            elif t[0].startswith("C"):
                buckets["circ"]["total"] += 1
                buckets["circ"]["expected"] += cat in (CHIBSJ, CHI2BSJ,
                                                       CONCRD, CHIORF)
    out = {"categories": by_cat}
    for k, v in buckets.items():
        out[k] = {**v, "frac": round(v["expected"] / v["total"], 4)
                  if v["total"] else 0.0}
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Score a PAM mapping file against ground truth")
    ap.add_argument("pam")
    ap.add_argument("--truth-sam", help="ground-truth SAM (CIGAR walked)")
    args = ap.parse_args(argv)
    if args.truth_sam:
        res = score_pam_vs_sam(args.pam, load_truth_sam(args.truth_sam))
    else:
        res = score_pam_vs_sim(args.pam)
    print(json.dumps(res, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
