"""Offline evaluation tooling (reference: scripts/ — SURVEY.md §2 #19).

Modern equivalents of the reference's Python2/C++ eval scripts:

- circ_compare:  TP/FP/FN of a circ_report vs. ground truth with breakpoint
                 tolerance (scripts/circ_simulation_eval/find_TP.py).
- annotate:      annotate circ_report events with matching transcripts/exons
                 from a GTF (scripts/annotate_transcript.py).
- gtf_convert:   UCSC-style GTF (exon-only) -> Ensembl-style with
                 gene/transcript records (scripts/convertGTF.py).
- pam_eval:      per-read mapping accuracy of a PAM file vs. simulation truth
                 or a ground-truth SAM (scripts/evaluation/eval.cpp,
                 evaluate.py).
- report_diff:   event + support-read set diff between two circ_reports
                 (scripts/compare_multiple_tools/diff.cpp).
- ciri:          normalize CIRI-style output for cross-tool comparison
                 (scripts/circ_simulation_eval/convert_ciri.py).
"""
