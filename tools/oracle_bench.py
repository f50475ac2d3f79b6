#!/usr/bin/env python3
"""DuckDB oracle benchmark — the denominator for the "within 2x of the
oracle" performance gate (round-5 review asked for this number to live in
the repo, not in a judge's session). Dev tool, driver-side deps only
(duckdb). Usage:

    ./run_local.sh graft.Verify /root/testdata/sf0.1 /tmp/verify_out_sf01
    python3 tools/oracle_bench.py /root/testdata/sf0.1 \
        /tmp/verify_out_sf01/oracle_sql.json [ORACLE_BENCH.json]

Runs every oracle SQL (the exact same 159 statements the driver's
correctness gate executes) in DuckDB at 32 threads over the same parquet
tables, one warm-up pass then `ITERS` timed passes per query (min taken —
same min-of-iters methodology as graft.Bench), and writes one JSON object
with per-query and total seconds. Compare `total` against BENCH.json's
"value" for the Spark/oracle ratio quoted in README.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
ITERS = 2
THREADS = 32


def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "ORACLE_BENCH.json"
    oracle = json.load(open(oracle_path))

    con = duckdb.connect()
    con.execute(f"SET threads TO {THREADS}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    wall0 = time.time()
    queries, cold, errors = {}, {}, {}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            t0 = time.time()
            con.execute(sql).fetchall()  # materialize fully, like noop sink
            cold[name] = time.time() - t0
            times = []
            for _ in range(ITERS):
                t0 = time.time()
                con.execute(sql).fetchall()
                times.append(time.time() - t0)
            queries[name] = min(times)
        except Exception as e:
            errors[name] = str(e)[:200]
            queries[name] = -1.0

    total = sum(v for v in queries.values() if v >= 0)
    out = {
        "metric": "oracle_total",
        "value": round(total, 4),
        "unit": "sec",
        "engine": f"duckdb {duckdb.__version__}",
        "threads": THREADS,
        "iters": ITERS,
        "sf": sf_dir,
        "n_queries": len(queries),
        "queries": {k: round(v, 4) for k, v in queries.items()},
        "cold_sec": {k: round(v, 4) for k, v in cold.items()},
        "errors": errors,
        "wall_sec": round(time.time() - wall0, 1),
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"oracle total {total:.1f}s over {len(queries)} queries "
          f"({len(errors)} errors) -> {out_path}")


if __name__ == "__main__":
    main()
