#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sfdir] [outdir]
Reads outdir/<name>/ parquet (written by graft.Verify) and
outdir/oracle_sql.json, runs each oracle against the sfdir tables in
DuckDB, and compares (columns sorted by name, rows sorted by all
columns, exact value equality after normalizing to pandas objects).
"""
import sys, json, glob, os, time, threading
import duckdb
import pandas as pd

# --json PATH: also write per-query results ({"queries": {name:
# {"pass": bool, "rows": int}}, "_oracle_secs": {...}}) for artifact
# generation (tools/sf01_spot.py). Stripped before positional parsing.
json_out = None
_argv = sys.argv[:]
if "--json" in _argv:
    i = _argv.index("--json")
    if i + 1 >= len(_argv):
        print("usage: check.py [sfdir] [outdir] [names] --json PATH")
        sys.exit(2)
    json_out = _argv[i + 1]
    del _argv[i:i + 2]
sys.argv = _argv

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# Per-oracle wall budget. One pathological oracle (q92's un-materialized
# CTE chain, round 6) silently blew the whole driver run; a slow oracle
# must fail ITS row loudly instead. 60s: the heaviest legitimate oracles
# (pagerank/clean-corpus chains) run 20-28s and inflate ~1.5x under
# machine load — the budget must separate "heavy" from "pathological"
# (the round-6 case was >600s), not flake on load. Override:
# ORACLE_BUDGET_SEC.
budget = float(os.environ.get("ORACLE_BUDGET_SEC", "60"))
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None  # name filter

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
dirs = sorted(d for d in os.listdir(outdir)
              if os.path.isdir(os.path.join(outdir, d)))
# Declared-query completeness, layer 2: Verify writes a directory even
# for a throwing query, so the only way a DECLARED query (an oracle_sql
# key) has no directory is the Verify JVM dying mid-run (OOM, kill).
# Those must fail loudly, not shrink the denominator (the round-8
# "99 looks like 99/99 when it was 99/102" failure mode).
_declared_path = os.path.join(outdir, "verify_declared.json")
_declared = json.load(open(_declared_path)) if os.path.exists(_declared_path) else []
_dead = sorted(set(_declared) - set(dirs)) if len(sys.argv) <= 3 else []
for name in _dead:  # the manifest is written BEFORE Verify's query loop
    print(f"FAIL {name}: declared in {os.path.basename(_declared_path)} but no "
          f"output dir (Verify died before reaching it?)")
if only is not None:
    missing = only - set(dirs)
    if missing:  # a typo'd filter must not yield a green 0/0 run
        print(f"ERROR: filter names not in {outdir}: {sorted(missing)}")
        sys.exit(2)
names = [d for d in dirs if only is None or d in only]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("float64")  # unify int widths for compare
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)

fails = []
oracle_secs = {}
rowcounts = {}
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        err_file = os.path.join(outdir, name, "_ERROR.txt")
        err = open(err_file).read().strip() if os.path.exists(err_file) else "no parquet written"
        print(f"FAIL {name}: {err}"); fails.append(name); continue
    got_raw = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    got = canon(got_raw)
    rowcounts[name] = len(got)
    if name not in oracle:
        print(f"ROWS-ONLY {name}: {len(got)} rows " + ("OK" if len(got) else "EMPTY!"))
        if not len(got): fails.append(name)
        continue
    t0 = time.monotonic()
    watchdog = threading.Timer(budget, con.interrupt)
    watchdog.start()
    try:
        exp_raw = con.sql(oracle[name]).df()
        exp = canon(exp_raw)
    except Exception as e:
        el = time.monotonic() - t0
        if el >= budget:
            print(f"FAIL {name}: oracle exceeded {budget:.0f}s budget "
                  f"(interrupted at {el:.1f}s) — driver-intractable SQL")
        else:
            print(f"FAIL {name}: oracle SQL error: {e}")
        fails.append(name); continue
    finally:
        watchdog.cancel()
    el = time.monotonic() - t0
    oracle_secs[name] = el
    if el > budget * 0.5:
        print(f"WARN {name}: oracle took {el:.1f}s (budget {budget:.0f}s)")
    # Driver-hash fidelity: the driver stringifies values, so an int64
    # column on one side vs float64 on the other ("1" vs "1.0") hash-
    # mismatches even when numerically equal. DuckDB's HUGEINT (e.g.
    # windowed sum over integers) → pandas float64 is the classic case.
    kind_bad = [c for c in got_raw.columns if c in exp_raw.columns
                and {got_raw[c].dtype.kind, exp_raw[c].dtype.kind} == {"i", "f"}]
    if kind_bad:
        print(f"FAIL {name}: int-vs-float type class on {kind_bad} "
              f"(driver hash would mismatch; CAST the oracle side)")
        fails.append(name); continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails.append(name); continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails.append(name); continue
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
        print(f"OK   {name}: {len(got)} rows")
    except AssertionError as e:
        print(f"FAIL {name}: value mismatch: {str(e).splitlines()[-1] if str(e) else e}")
        # show first differing rows
        neq = (got != exp) & ~(got.isna() & exp.isna())
        bad = neq.any(axis=1)
        if bad.any():
            i = bad.idxmax()
            print("  got:", got.loc[i].to_dict())
            print("  exp:", exp.loc[i].to_dict())
        fails.append(name)

if oracle_secs:
    slow = sorted(oracle_secs.items(), key=lambda kv: -kv[1])[:5]
    print("\nslowest oracles: " + ", ".join(f"{n}={s:.1f}s" for n, s in slow))
fails.extend(_dead)
total = len(names) + len(_dead)
if json_out:
    # Per-query results live under their own key so a query literally
    # named "_oracle_secs" could never collide with the timing map.
    results = {
        "queries": {n: {"pass": n not in fails, "rows": rowcounts.get(n, 0)}
                    for n in names + _dead},
        "_oracle_secs": {k: round(v, 1) for k, v in
                         sorted(oracle_secs.items(), key=lambda kv: -kv[1])},
    }
    json.dump(results, open(json_out, "w"), indent=1)
print(f"\n{total-len(fails)}/{total} pass" + (f"; FAILURES: {fails}" if fails else ""))
sys.exit(1 if fails else 0)
