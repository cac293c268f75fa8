#!/usr/bin/env python3
"""Mechanical sf0.1 oracle spot-run (round-10 verdict ask #7).

Derives the query list from the latest bench JSON — the top-N batch
queries by median (where scale-dependent bugs would hide: overflow,
spill paths, AQE plan switches) plus the ENTIRE streaming surface
(*_stream queries, whose watermark/state behavior is volume-dependent)
— runs graft.Verify against sf0.1, compares via tools/check.py with a
stretched oracle budget, and regenerates CORRECTNESS_sf0.1_spot.json.

Usage: python3 tools/sf01_spot.py [bench_json] [sfdir] [outdir] [topN]
Defaults: bench_out.json /root/testdata/sf0.1 /tmp/verify_sf01 12
"""
import datetime
import json
import os
import subprocess
import sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/verify_sf01"
topn = int(sys.argv[4]) if len(sys.argv) > 4 else 12

bench = json.load(open(bench_path))
medians = bench["queries"]
streaming = sorted(n for n in medians if n.endswith("_stream"))
heavy = [n for n, _ in sorted(medians.items(), key=lambda kv: -kv[1])
         if n not in streaming][:topn]
# Always-run volume points regardless of bench rank (round-16 verdict
# ask #6): the KMV panel's estimate-vs-exact divergence is scale-
# dependent and its oracle replays the estimator, so a cheap sf0.1 row
# is insurance the top-N ranking won't buy (q183 is fast); q185 keeps
# the conf-forced bounded KN branch checked above the sf0.01 gate too.
forced = [n for n in ("q183_distinct_n_sketch",
                      "q185_kn_trigram_pruned_bounded") if n in medians]
names = sorted(set(heavy) | set(streaming) | set(forced))
lst = ",".join(names)
print(f"[sf01-spot] {len(names)} queries: {lst}")

env = dict(os.environ, SPARK_GRAFT_VERIFY_ONLY=lst,
           SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"))
subprocess.run(["sbt", "-batch", f"runMain graft.Verify {sfdir} {outdir}"],
               env=env, check=True)

results_tmp = os.path.join(outdir, "_spot_results.json")
env2 = dict(os.environ, ORACLE_BUDGET_SEC=os.environ.get(
    "ORACLE_BUDGET_SEC", "1800"))
cmp_proc = subprocess.run(
    [sys.executable, os.path.join(os.path.dirname(__file__), "check.py"),
     sfdir, outdir, lst, "--json", results_tmp], env=env2)

# check.py writes the JSON only after its full compare loop; if it
# crashed earlier (bad outdir, duckdb error) the file is absent and the
# REAL failure is its exit code — surface that instead of a masking
# FileNotFoundError from json.load.
if not os.path.exists(results_tmp):
    print(f"[sf01-spot] ERROR: check.py exited {cmp_proc.returncode} "
          f"without writing {results_tmp} — see its output above")
    sys.exit(cmp_proc.returncode or 1)
payload = json.load(open(results_tmp))
results = payload["queries"]
oracle_secs = payload.get("_oracle_secs", {})
npass = sum(1 for v in results.values() if v.get("pass"))
artifact = {
    "_meta": {
        "purpose": f"Mechanical oracle spot-run at sf0.1: top-{topn} "
                   "batch queries by bench median plus the full "
                   "streaming surface (*_stream) - correctness above "
                   "the sf0.01 gate, where scale-dependent bugs "
                   "(overflow, spill paths, AQE plan switches, "
                   "watermark/state behavior at volume) would hide",
        "date": datetime.date.today().isoformat(),
        "sf": sfdir,
        "bench_source": bench_path,
        "command": f"python3 tools/sf01_spot.py {bench_path} {sfdir} {outdir} {topn}",
        "result": f"{npass}/{len(results)} pass (rows+schema+values)",
        "slowest_oracles_sec": dict(list(oracle_secs.items())[:5]),
    },
}
artifact.update(results)
with open("CORRECTNESS_sf0.1_spot.json", "w") as f:
    json.dump(artifact, f, indent=1)
print(f"[sf01-spot] wrote CORRECTNESS_sf0.1_spot.json: {npass}/{len(results)} pass")
sys.exit(cmp_proc.returncode)
