#!/usr/bin/env python3
"""Best-of adjudication for the round-16 optimization bench runs: per-query
min across the three production runs plus each run's sequential rerun
samples (same protocol as BENCH_local_r15_best / r16_best)."""
import json

runs = [json.load(open(f"BENCH_local_r16o_run{i}.json")) for i in (1, 2, 3)]
names = list(runs[0]["queries"])
best = {}
for n in names:
    samples = [r["queries"][n] for r in runs if n in r["queries"]]
    samples += [r["rerun"][n] for r in runs if n in r.get("rerun", {})]
    best[n] = min(samples)
total = sum(best.values())
out = {
    "metric": "total", "value": total, "unit": "sec",
    "queries": best,
    "note": "per-query min across runs 1-3 + rerun samples (r15 protocol)",
    "sf": runs[0]["sf"],
}
with open("BENCH_local_r16o_best.json", "w") as f:
    json.dump(out, f)
print(f"best-of-3 total {total:.1f} s over {len(best)} queries")
prev = json.load(open("BENCH_local_r16_best.json"))["queries"]
shared = [n for n in best if n in prev]
pt = sum(prev[n] for n in shared)
bt = sum(best[n] for n in shared)
print(f"shared {len(shared)}: {pt:.1f} -> {bt:.1f}  ({pt / bt:.2f}x)")
imp = sorted(((prev[n] - best[n], n) for n in shared), reverse=True)
print("top improvements:")
for d, n in imp[:20]:
    print(f"  {n:36s} {prev[n]:6.2f} -> {best[n]:6.2f}  (-{d:.2f})")
print("regressions > 0.3s+20%:")
for d, n in imp:
    if -d > 0.3 and best[n] > 1.2 * prev[n]:
        print(f"  {n:36s} {prev[n]:6.2f} -> {best[n]:6.2f}  (+{-d:.2f})")
