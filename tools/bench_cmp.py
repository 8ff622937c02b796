#!/usr/bin/env python3
"""Compare two bench JSON artifacts (full per-query lines): per-family and
per-query deltas. Usage: bench_cmp.py A.json B.json [minMs]"""
import json, sys, collections

def load(p):
    with open(p) as f:
        txt = f.read()
    # artifact files hold the full per-query object on one line
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            o = json.loads(line)
            if o.get("unit") == "ms":
                return o["queries"], o["value"]
    raise SystemExit(f"no full per-query line in {p}")

def fam(k):
    if len(k) > 1 and k[0] == "q" and k[1].isdigit():
        return "tpch"
    return k.split("_")[0]

a, ta = load(sys.argv[1])
b, tb = load(sys.argv[2])
min_ms = int(sys.argv[3]) if len(sys.argv) > 3 else 100
fa, fb = collections.Counter(), collections.Counter()
for k, v in a.items():
    if v >= 0: fa[fam(k)] += v
for k, v in b.items():
    if v >= 0: fb[fam(k)] += v
print(f"total: {ta} -> {tb}  ({ta/tb:.2f}x)")
print("\n-- families --")
for f in sorted(set(fa) | set(fb)):
    x, y = fa.get(f, 0), fb.get(f, 0)
    r = x / y if y else float("inf")
    print(f"{f:12s} {x:7d} -> {y:7d}  {r:5.2f}x")
print(f"\n-- queries (|delta| ranked, >= {min_ms} ms either side) --")
rows = []
for k in sorted(set(a) | set(b)):
    x, y = a.get(k, -1), b.get(k, -1)
    if max(x, y) >= min_ms:
        rows.append((abs(x - y), k, x, y))
rows.sort(reverse=True)
for d, k, x, y in rows[:40]:
    r = (x / y) if y > 0 else float("inf")
    print(f"{k:28s} {x:7d} -> {y:7d}  {r:5.2f}x")
