"""circRNA call accuracy vs. ground truth with breakpoint tolerance.

Reference behavior: scripts/circ_simulation_eval/find_TP.py — each called
event matches at most one unclaimed truth event on the same chromosome with
both breakpoints within ``bp_res`` (default 10); unmatched calls are FPs,
unclaimed truths are FNs.  This version also emits a machine-readable
summary (precision/recall/F1) and accepts either a reference-style truth TSV
(``chr spos epos [support [type...]]``) or this repo's ``truth.json``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from typing import List, Optional, Tuple


@dataclasses.dataclass
class CircEvent:
    chrom: str
    spos: int
    epos: int
    support: int = 0
    extra: str = ""


def load_truth(path: str, default_chrom: str = "chr1") -> List[CircEvent]:
    """Truth TSV (chr spos epos ...) or truth.json ({"circ_bp": [[s,e],..]})."""
    if path.endswith(".json"):
        with open(path) as f:
            data = json.load(f)
        return [CircEvent(default_chrom, int(s), int(e))
                for s, e in data["circ_bp"]]
    events = []
    with open(path) as f:
        for line in f:
            t = line.split()
            if not t or t[0] in ("chr", "#"):
                continue
            events.append(CircEvent(t[0], int(t[1]), int(t[2]),
                                    int(t[3]) if len(t) > 3 else 0,
                                    " ".join(t[4:])))
    return events


def load_report(path: str) -> List[CircEvent]:
    """A circ_report: chr spos epos support type signal... (header 'chr'
    skipped)."""
    return load_truth(path)


def match_events(calls: List[CircEvent], truth: List[CircEvent],
                 bp_res: int = 10) -> Tuple[List[Tuple[CircEvent,
                                                       Optional[CircEvent]]],
                                            List[CircEvent]]:
    """Greedy one-to-one matching in call order (find_TP.py semantics).
    Returns ([(call, matched_truth_or_None)], unmatched_truth)."""
    claimed = [False] * len(truth)
    pairs = []
    for c in calls:
        hit = None
        for i, t in enumerate(truth):
            if (not claimed[i] and c.chrom == t.chrom
                    and abs(c.spos - t.spos) <= bp_res
                    and abs(c.epos - t.epos) <= bp_res):
                claimed[i] = True
                hit = t
                break
        pairs.append((c, hit))
    missed = [t for i, t in enumerate(truth) if not claimed[i]]
    return pairs, missed


def summarize(pairs, missed) -> dict:
    tp = sum(1 for _, t in pairs if t is not None)
    fp = len(pairs) - tp
    fn = len(missed)
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": round(prec, 4), "recall": round(rec, 4),
            "f1": round(f1, 4)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Compare a circ_report against ground truth (±bp_res)")
    ap.add_argument("truth", help="truth TSV or truth.json")
    ap.add_argument("report", help="circ_report to score")
    ap.add_argument("--bp-res", type=int, default=10)
    ap.add_argument("--chrom", default="chr1",
                    help="chromosome for truth.json events")
    ap.add_argument("--json", action="store_true",
                    help="print only the JSON summary")
    args = ap.parse_args(argv)

    truth = load_truth(args.truth, args.chrom)
    calls = load_report(args.report)
    pairs, missed = match_events(calls, truth, args.bp_res)
    if not args.json:
        for c, t in pairs:
            tag = (f"TP\t{t.chrom}\t{t.spos}\t{t.epos}" if t else "FP")
            print(f"{c.chrom}\t{c.spos}\t{c.epos}\t{c.support}\t{tag}")
        for t in missed:
            print(f"{t.chrom}\t{t.spos}\t{t.epos}\t{t.support}\tFN")
    print(json.dumps(summarize(pairs, missed)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
