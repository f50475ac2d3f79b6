#!/usr/bin/env python3
"""Round-gate replica with phase timings (round-11 verdict items 2+3).

Round 11 shipped 47 queries AFTER its final verify/bench artifacts ran,
and the driver's own end-of-round pipeline then blew its wall budget on
oracle SQL those artifacts had never measured (CORRECTNESS_r11 = {},
BENCH_r11 rc=124). This tool makes both failure modes visible BEFORE the
driver runs:

  1. graft.Verify at sf0.01 (Spark)        -> phases.verify_sf001_sec
  2. oracle value check at sf0.01 (DuckDB) -> phases.oracle_sf001_sec
  3. graft.Bench at sf0.1 (Spark)          -> phases.bench_sf01_sec
  4. oracle bench at sf0.1 (DuckDB)        -> phases.oracle_sf01_sec

and writes ROUNDCHECK.json with the four timings, the per-query verify
verdicts, and the md5 of the sorted query-name list. DriverContractSpec
asserts that md5 matches the live SparkEntry surface and that ok=true —
so landing a query without re-running roundcheck turns `sbt test` red:
it is structurally impossible to close a round whose artifacts predate
the query surface.

Usage:
  python3 tools/roundcheck.py               # full run (round close)
  python3 tools/roundcheck.py --incremental # verify/oracle-check only the
      queries not yet in ROUNDCHECK.json's verified map (mid-round query
      commits); phases 3-4 are carried forward and marked stale. A full
      run must still close the round (the carried bench numbers do not
      cover the new queries, and code changes to ALREADY-verified queries
      are only re-checked by a full run).

Budget: the driver's end-of-round ceiling was exceeded at ~4700s of
phase work in round 11; BUDGET_SEC asserts the full pipeline stays under
4500s so a regression shows up as ok=false in the diff, not as the
driver's SIGKILL. Round 13 adds PER-PHASE budgets (round-12 verdict item
4): the driver's bench died at a per-phase ceiling (~900s, r11/r12
rc=124) while the 4500s total stayed green, so each phase is now pinned
to its own last-known-driver-green level and ok=false fires locally
before the driver rc=124s.

Round-close integrity (round-12 advice, medium): an --incremental run
carries phases 3-4 forward from the last full run, so its bench numbers
describe THAT run's query surface, not necessarily the live one.
`benched_query_md5` records the surface md5 of the last FULL run
(incremental runs carry it forward verbatim); DriverContractSpec asserts
it against the live surface, so landing a query and closing the round on
an incremental roundcheck is structurally red until a full run measures
the new surface.
"""
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"
VERIFY_OUT = "/tmp/roundcheck_verify"
BUDGET_SEC = 4500.0
# Per-phase ceilings (round-12 verdict item 4). Calibration (round 13):
# two same-code full bench runs 90 minutes apart measured 1060s and
# 1199s wall with the CPU probe at its healthy floor both times — the
# box swings ±15% in a mode even a per-thread spin probe cannot see
# (bandwidth/IO-side). A pin inside that band turns the gate red on
# host weather; the failures these budgets exist to catch are the
# STRUCTURAL blowups (r11/r12 bench: 1900s+ from 3 sweeps x 2 iters +
# unbounded noise reruns; r11 oracle: 1460s from re-inlined CTEs). So
# each pin sits ~2 sigma above the healthy-window level and well below
# the structural-failure level: bench 1060-1200 measured vs 1500 pin vs
# 1900+ failure; verify 624-1020 measured vs 1200 pin; oracle bench
# 788 measured vs 1200 pin vs 1460 failure.
PHASE_BUDGETS = {
    "verify_sf001_sec": 1200.0,
    "oracle_sf001_sec": 300.0,
    "bench_sf01_sec": 1500.0,
    "oracle_sf01_sec": 1200.0,
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run(cmd, **kw):
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, **kw)
    return time.time() - t0, r.returncode


def oracle_check(sf_dir, out_dir, names):
    """tools/oracle_check.py semantics, in-process: returns verdict map."""
    import duckdb
    import pyarrow.parquet as pq
    import math

    def canon(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        return str(v)

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    verdicts = {}
    for name in names:
        if name not in oracle:
            # documented rows-only queries: parquet must exist with rows
            try:
                n = pq.read_table(f"{out_dir}/{name}").num_rows
                verdicts[name] = "rows-only" if n > 0 else "FAIL:empty"
            except Exception as e:
                verdicts[name] = f"FAIL:{e}"[:120]
            continue
        try:
            odf = con.execute(oracle[name]).fetch_arrow_table()
            sdf = pq.read_table(f"{out_dir}/{name}")
            if sorted(odf.column_names) != sorted(sdf.column_names):
                verdicts[name] = "FAIL:schema"
                continue
            if odf.num_rows != sdf.num_rows:
                verdicts[name] = "FAIL:rows"
                continue
            ocols = {c: odf.column(c).to_pylist() for c in odf.column_names}
            scols = {c: sdf.column(c).to_pylist() for c in sdf.column_names}
            okeys = sorted(odf.column_names)
            orows = sorted(tuple(canon(ocols[c][i]) for c in okeys)
                           for i in range(odf.num_rows))
            srows = sorted(tuple(canon(scols[c][i]) for c in okeys)
                           for i in range(sdf.num_rows))
            verdicts[name] = "pass" if orows == srows else "FAIL:values"
        except Exception as e:
            verdicts[name] = f"FAIL:{e}"[:120]
    return verdicts


def regate():
    """Re-evaluate the ok/phase_fails verdict of an EXISTING full record
    against the current budget tables, without re-running any phase.

    The measurements in ROUNDCHECK.json are real and stay untouched;
    this exists for budget-table recalibration (a constant change in
    this file) so the gate law can be re-applied to recorded data
    instead of burning a ~45-minute pipeline to re-measure what was
    already measured. Anything that could change a MEASUREMENT (code,
    queries, testdata) still requires a real run — query_md5 /
    benched_query_md5 are untouched, so DriverContractSpec's
    surface-match laws keep their teeth."""
    rc_path = os.path.join(REPO, "ROUNDCHECK.json")
    record = json.load(open(rc_path))
    phases = record["phases"]
    fails = record.get("fails", {})
    total = sum(v for v in phases.values() if isinstance(v, (int, float)))
    phase_fails = {
        p: {"sec": phases.get(p), "budget_sec": b}
        for p, b in PHASE_BUDGETS.items()
        if not isinstance(phases.get(p), (int, float)) or phases[p] > b
    }
    record["phase_budgets"] = PHASE_BUDGETS
    record["phase_fails"] = phase_fails
    record["budget_sec"] = BUDGET_SEC
    record["ok"] = not fails and not phase_fails and total <= BUDGET_SEC
    record["regated_utc"] = time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(rc_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(f"[roundcheck] regate ok={record['ok']} "
          f"phase_fails={phase_fails}", flush=True)
    sys.exit(0 if record["ok"] else 1)


def main():
    if "--regate" in sys.argv:
        regate()
        return
    incremental = "--incremental" in sys.argv
    prev = {}
    rc_path = os.path.join(REPO, "ROUNDCHECK.json")
    if incremental and os.path.exists(rc_path):
        prev = json.load(open(rc_path))

    # live query surface: ask the engine itself (one JVM, prints names)
    names_out = subprocess.run(
        ["./run_local.sh", "graft.QueryNames"], cwd=REPO,
        capture_output=True, text=True)
    all_names = sorted(l.strip() for l in names_out.stdout.splitlines()
                       if l.strip().startswith("q"))
    if not all_names:
        print("FATAL: could not enumerate SparkEntry.queries", file=sys.stderr)
        sys.exit(2)
    todo = [n for n in all_names if n not in prev.get("verified", {})] \
        if incremental else all_names
    print(f"[roundcheck] surface={len(all_names)} queries, "
          f"verifying {len(todo)}", flush=True)

    phases = {}
    # 1. Verify sf0.01
    t, rc = run(["./run_local.sh", "graft.Verify", SF001, VERIFY_OUT] + todo,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    phases["verify_sf001_sec"] = round(t, 1)
    if rc != 0:
        print(f"FATAL: Verify rc={rc}", file=sys.stderr)
        sys.exit(2)
    # 2. Oracle value check sf0.01
    t0 = time.time()
    verdicts = oracle_check(SF001, VERIFY_OUT, todo)
    phases["oracle_sf001_sec"] = round(time.time() - t0, 1)
    if incremental:
        merged = dict(prev.get("verified", {}))
        merged.update(verdicts)
        verdicts = merged
    fails = {k: v for k, v in verdicts.items() if v.startswith("FAIL")}

    if incremental and "phases" in prev:
        phases["bench_sf01_sec"] = prev["phases"].get("bench_sf01_sec")
        phases["oracle_sf01_sec"] = prev["phases"].get("oracle_sf01_sec")
        benched_md5 = prev.get("benched_query_md5")
        scope = "incremental"
    else:
        # 3. Spark bench sf0.1 (full surface; writes BENCH.json)
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF01)
        t, rc = run(["./run_local.sh", "graft.Bench"], env=env,
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        phases["bench_sf01_sec"] = round(t, 1)
        if rc != 0:
            print(f"FATAL: Bench rc={rc}", file=sys.stderr)
            sys.exit(2)
        # 4. Oracle bench sf0.1 (the oracle SQL is sf-agnostic — reuse
        # phase 1's dump)
        t2, rc2 = run([sys.executable, "tools/oracle_bench.py", SF01,
                       f"{VERIFY_OUT}/oracle_sql.json",
                       "ORACLE_BENCH.json"],
                      stdout=subprocess.DEVNULL)
        phases["oracle_sf01_sec"] = round(t2, 1)
        if rc2 != 0:
            print(f"FATAL: oracle bench rc={rc2}", file=sys.stderr)
            sys.exit(2)
        benched_md5 = hashlib.md5("\n".join(all_names).encode()).hexdigest()
        scope = "full"

    total = sum(v for v in phases.values() if isinstance(v, (int, float)))
    # Per-phase budgets apply to incremental runs too: the carried numbers
    # are the last full run's real measurements, and an incremental run
    # with no prior full run (phase = None) cannot claim ok.
    phase_fails = {
        p: {"sec": phases.get(p), "budget_sec": b}
        for p, b in PHASE_BUDGETS.items()
        if not isinstance(phases.get(p), (int, float)) or phases[p] > b
    }
    ok = not fails and not phase_fails and total <= BUDGET_SEC
    record = {
        "scope": scope,
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_queries": len(all_names),
        "query_md5": hashlib.md5("\n".join(all_names).encode()).hexdigest(),
        "benched_query_md5": benched_md5,
        "phases": phases,
        "phase_budgets": PHASE_BUDGETS,
        "phase_fails": phase_fails,
        "phase_total_sec": round(total, 1),
        "budget_sec": BUDGET_SEC,
        "n_pass": sum(1 for v in verdicts.values() if v == "pass"),
        "n_rows_only": sum(1 for v in verdicts.values() if v == "rows-only"),
        "fails": fails,
        "verified": verdicts,
        "ok": ok,
    }
    with open(rc_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(f"[roundcheck] scope={scope} phases={phases} "
          f"total={total:.0f}s ok={ok} fails={len(fails)}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
