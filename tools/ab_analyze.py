#!/usr/bin/env python3
"""Analyze the round-11 baseline re-peg A/B (tools/ab_repeg.sh output):
per-side min over invocations, per-query head-vs-r9 delta table, and the
disposition evidence for the two round-10 flagged queries.

Usage: python3 tools/ab_analyze.py [/tmp/graft_ab]
"""
import json, glob, os, sys

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_ab"

def load(side):
    arts = []
    for p in sorted(glob.glob(os.path.join(d, f"{side}_*.json"))):
        with open(p) as f:
            arts.append((os.path.basename(p), json.load(f)))
    return arts

head, r9 = load("head"), load("r9")
if not head or not r9:
    sys.exit(f"missing artifacts in {d}: head={len(head)} r9={len(r9)}")

def summarize(side, arts):
    for name, a in arts:
        print(f"{side} {name}: total={a['value']:.1f} batch={a['batch_total']:.1f} "
              f"stream={a['streaming_total']:.1f} contended={a['contended']} "
              f"maxratio={a['contention_max_ratio']} "
              f"stream_stable={a['streaming_stable']}")

summarize("head", head)
summarize("r9", r9)

def mins(arts):
    out = {}
    for _, a in arts:
        for q, t in a["queries"].items():
            out[q] = min(out.get(q, 1e9), t)
    return out

hm, rm = mins(head), mins(r9)
common = sorted(set(hm) & set(rm))
ht = sum(hm[q] for q in common)
rt = sum(rm[q] for q in common)
hb = sum(hm[q] for q in common if "stream" not in q)
rb = sum(rm[q] for q in common if "stream" not in q)
print(f"\nmin-over-invocations totals ({len(common)} common queries):")
print(f"  head: total={ht:.1f} batch={hb:.1f}")
print(f"  r9:   total={rt:.1f} batch={rb:.1f}")
print(f"  head/r9 = {ht/rt:.3f} (batch {hb/rb:.3f})")

print("\nflagged-query disposition (r10 VERDICT weak marks):")
for q in ["dedup_cluster_keep_best", "graph_pagerank", "graph_triangles", "ann_recall"]:
    if q in common:
        print(f"  {q}: head={hm[q]:.3f} r9={rm[q]:.3f} head/r9={hm[q]/rm[q]:.2f}")
        for name, a in head + r9:
            rt20 = a.get("runs_top20", {}).get(q)
            if rt20:
                print(f"    {name}: passes={rt20['passes']}")

deltas = sorted(((hm[q] - rm[q], q) for q in common), reverse=True)
print("\nlargest head-slower deltas (s):")
for dta, q in deltas[:12]:
    print(f"  {dta:+.3f} {q}: head={hm[q]:.3f} r9={rm[q]:.3f}")
print("largest head-faster deltas (s):")
for dta, q in deltas[-12:]:
    print(f"  {dta:+.3f} {q}: head={hm[q]:.3f} r9={rm[q]:.3f}")

up = sum(1 for q in common if hm[q] > rm[q] * 1.2)
down = sum(1 for q in common if hm[q] < rm[q] / 1.2)
print(f"\nqueries >20% slower on head: {up}; >20% faster on head: {down}")
