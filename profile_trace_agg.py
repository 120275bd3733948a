"""Aggregate a captured device trace: per-op-name totals with HLO identity
and source attribution.  Usage: python profile_trace_agg.py <trace.json.gz>"""
import gzip, json, sys, collections
path = sys.argv[1]
with gzip.open(path) as f:
    data = json.load(f)
ev = data.get("traceEvents", [])
pids = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
rows = collections.defaultdict(lambda: [0.0, 0, "", ""])
for e in ev:
    if e.get("ph") != "X" or "TPU" not in pids.get(e["pid"], ""):
        continue
    a = e.get("args", {})
    cat = a.get("hlo_category", "?")
    if cat in ("while", "conditional"):
        continue  # containers double-count children
    name = e["name"].split("(")[0]
    key = a.get("deduplicated_name", name) or name
    r = rows[key]
    r[0] += e.get("dur", 0.0)
    r[1] += 1
    ln = a.get("long_name", "")
    if not r[2]:
        r[2] = ln[:160]
    src = a.get("source", "")
    if src and not r[3]:
        r[3] = src
tot = sum(r[0] for r in rows.values())
print(f"total device op time {tot/1e3:.1f} ms  ({len(rows)} dedup ops)")
bysrc = collections.defaultdict(float)
for k, (d, c, ln, src) in rows.items():
    bysrc[src or "?"] += d
print("\n== by source ==")
for s, d in sorted(bysrc.items(), key=lambda kv: -kv[1])[:25]:
    print(f"  {d/1e3:9.2f} ms  {s}")
print("\n== top dedup ops ==")
for k, (d, c, ln, src) in sorted(rows.items(), key=lambda kv: -kv[1][0])[:35]:
    print(f"  {d/1e3:9.2f} ms x{c:5d}  {k:30s} {src}")
    print(f"      {ln[:150]}")

# scope aggregation (named_scope shows in tf_op)
byscope = collections.defaultdict(float)
for e in ev:
    if e.get("ph") != "X" or "TPU" not in pids.get(e["pid"], ""):
        continue
    a = e.get("args", {})
    if a.get("hlo_category") in ("while", "conditional"):
        continue
    top = a.get("tf_op", "")
    # reduce to the deepest known scope marker
    mark = "?"
    for s in ("rf_cholinv", "rf_schur_solve", "rf_direction", "probe_step",
              "rf_", "refine", "prod_plain", "ev64", "tb_psdfeas",
              "tb_probe_rung", "tb_relax", "tb_round"):
        if s in top:
            mark = s
            break
    byscope[mark] += e.get("dur", 0.0)
print("\n== by scope ==")
for s, d in sorted(byscope.items(), key=lambda kv: -kv[1]):
    print(f"  {d/1e3:9.2f} ms  {s}")
