#!/usr/bin/env python3
"""Builder-side tooling: merge a Verify run's timings.json, a check.py
log, and (optionally) an AnnRecall log into one committed at-scale gate
record (bench_local/sf1_r{N}.json) — per-query green/red + wall seconds
+ recall, the artifact VERDICT r9 #1 asked to persist.

Usage: python3 tools/mk_scale_record.py <verifyOut> <checkLog> <out> \
           [sfLabel] [recallLog]
"""
import sys, json, re, os

def main():
    verify_out, check_log, out = sys.argv[1], sys.argv[2], sys.argv[3]
    sf = sys.argv[4] if len(sys.argv) > 4 else "sf1.0"
    recall_log = sys.argv[5] if len(sys.argv) > 5 else None

    timings = json.load(open(os.path.join(verify_out, "timings.json")))
    status = {}
    for line in open(check_log):
        m = re.match(r"(PASS|FAIL) (\S+?):? ", line)
        if m:
            status[m.group(2)] = m.group(1) == "PASS"
    queries = {}
    for name, t in sorted(timings.items()):
        queries[name] = {
            "pass": bool(status.get(name, False)) and t["dumped"],
            "sec": t["sec"],
        }
    n_pass = sum(1 for q in queries.values() if q["pass"])
    rec = {
        "metric": "scale_gate",
        "sf": sf,
        "n_queries": len(queries),
        "n_pass": n_pass,
        "n_fail": len(queries) - n_pass,
        "total_verify_sec": round(sum(t["sec"] for t in timings.values()), 1),
        "queries": queries,
    }
    if recall_log and os.path.exists(recall_log):
        rec["ann_recall"] = {}
        for line in open(recall_log):
            m = re.search(r"== (\S+) \(.*mean=([0-9.]+)", line)
            if m:
                rec["ann_recall"][m.group(1)] = float(m.group(2))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    json.dump(rec, open(out, "w"), indent=1)
    print(f"wrote {out}: {n_pass}/{len(queries)} pass, "
          f"verify {rec['total_verify_sec']}s")

if __name__ == "__main__":
    main()
