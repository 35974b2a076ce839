#!/usr/bin/env python3
"""Emit the OPTIMIZATION_r19 per-query audit table: every registry query
with its same-day before/after medians (full30 -> full32), scheduler
profile, and the action taken this round. Actions are keyed by query
name below so prose can never drift from the committed evidence files.

Usage: audit_r19.py tools/bench_evidence_full30.jsonl tools/bench_evidence_full32.jsonl
"""
import json
import statistics
import sys

ACTIONS = {}
for q in ["q32_ivf_knn", "q61_ivf_search_stored", "q72_ivf_incremental",
          "q76_ivf_recall", "q99_ivf_refresh"]:
    ACTIONS[q] = "CHANGED 1/2: train-seed from cache; retrain store-collapse pinned (3 scans -> 1)"
for q in ["q75_lsh_recall", "q77_quantized_recall"]:
    ACTIONS[q] = "CHANGED 3: recallContract perProbe pinned (duplicated contract subtree)"
ACTIONS["q76_ivf_recall"] += "; CHANGED 3 (perProbe pin)"
for q in ["q90_curation_quality", "q91_training_order",
          "q92_curriculum_order", "q96_curation_surgical"]:
    ACTIONS[q] = "CHANGED 4: curationKept identical-collapse (dupheavy 244s -> 3.6s)"
for q in ["q25_minhash_lsh", "q37_dedup_clusters", "q87_dedup_keep_best",
          "q28_simhash", "q36_embed_dedup_lsh", "q40_dedup_keep",
          "q49_incremental_dedup", "q79_embed_incremental",
          "q95_incremental_refresh", "q98_embed_refresh"]:
    ACTIONS[q] = "inherited collapse (1ab766b) verified+re-gated; balanced premium adjudicated in movers"
ACTIONS["q81_curation_full"] = "measured 225.3s dupheavy — contract-bound (near-identical, not identical); r20 item"
ACTIONS["q24_ngram_jaccard"] = "left: sanctioned quadratic baseline (maxRows-guarded)"
for q in ["q71_bm25_incremental", "q97_bm25_refresh", "q54_bm25_search",
          "q60_bm25_batch", "q65_bm25_stored"]:
    ACTIONS[q] = "left: BM25 faces re-audited; r8-r11 fuse/AQE-off measurements still hold"
ACTIONS["q20_dedup_exact"] = "left: already map-side hash-grouped (scale-safe)"
ACTIONS["q100_soft_dedup"] = "left: r18 aggregate-then-join shape, WindowExec-free (PlanAuditSpec)"
ACTIONS["q101_span_dedup"] = "left: text never crosses an exchange (plan audit)"
ACTIONS["q66_segment_dedup"] = "left: same"
DEFAULT = "left: plan audited (pruned ReadSchema/PushedFilters, no unexpected Exchange); cost is scan+agg floor"


def med(path):
    per = {}
    for line in open(path):
        r = json.loads(line)
        if r.get("failed"):
            continue
        per.setdefault(r["q"], []).append(r)
    return per


def main():
    old, new = med(sys.argv[1]), med(sys.argv[2])
    print("| query | full30 s | full32 s | jobs/stages/tasks (full32) | action |")
    print("|---|---|---|---|---|")
    for q in sorted(set(old) | set(new)):
        o = statistics.median([r["sec"] for r in old.get(q, [])]) if q in old else None
        n = statistics.median([r["sec"] for r in new.get(q, [])]) if q in new else None
        r = new.get(q, old.get(q))[-1]
        prof = f"{r['jobs']}/{r['stages']}/{r['tasks']}"
        act = ACTIONS.get(q, DEFAULT)
        print(f"| {q} | {o:.2f} | {n:.2f} | {prof} | {act} |")


if __name__ == "__main__":
    main()
