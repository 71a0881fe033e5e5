#!/usr/bin/env python3
"""Summarize a dev/altjvm_bench.sh JSONL: per-query across-round medians
per side and the B/A ratio — the number the alternating protocol exists
to produce (within-hour, order-rotated, fresh JVM per sample, so box
weather cancels in the ratio). Drops round 1 when >=4 rounds exist (JIT/
GC regime still settling — the q94jvm rule). Usage:
  dev/altjvm_summary.py <out.jsonl> [labelA] [labelB]
"""
import json
import statistics
import sys

path = sys.argv[1]
la = sys.argv[2] if len(sys.argv) > 2 else "A"
lb = sys.argv[3] if len(sys.argv) > 3 else "B"
rows = []
for line in open(path):
    line = line.strip()
    if not line or line == "DONE":
        continue
    rows.append(json.loads(line))
bad = [r for r in rows if not r.get("bench")]
if bad:
    sys.exit(f"FAILED rounds present: {bad}")
sides = {"A": {}, "B": {}}
rounds = max(r["round"] for r in rows)
for r in rows:
    if rounds >= 4 and r["round"] == 1:
        continue  # settling round
    for q, sec in r["bench"]["queries"].items():
        sides[r["side"]].setdefault(q, []).append(sec)
queries = sorted(sides["A"])
out = {}
print(f"{'query':34s} {la:>10s} {lb:>10s}  {lb}/{la}   n")
for q in queries:
    ma = statistics.median(sides["A"][q])
    mb = statistics.median(sides["B"][q])
    out[q] = {"a_med": round(ma, 3), "b_med": round(mb, 3),
              "ratio": round(mb / ma, 3) if ma > 0 else None,
              "a_samples": [round(x, 3) for x in sorted(sides["A"][q])],
              "b_samples": [round(x, 3) for x in sorted(sides["B"][q])]}
    print(f"{q:34s} {ma:10.3f} {mb:10.3f}  {mb / ma:5.3f}  {len(sides['A'][q])}/{len(sides['B'][q])}")
print(json.dumps({"file": path, "rounds": rounds,
                  "dropped_round1": rounds >= 4, "labels": [la, lb],
                  "per_query": out}))
