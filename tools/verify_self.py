#!/usr/bin/env python3
"""Round-close correctness twin of BENCH_SELF.json (r13 postmortem: the
driver's CORRECTNESS artifact was once silently `{}`, so the builder
publishes its own full gate result every round).

Runs the same columns-sorted/stable-sort-hash compare as
tools/oracle_precheck.py over a FULL graft.Verify dump and writes
VERIFY_SELF.json: the Verify sentinel, per-query OK/FAIL, and totals.

Usage: python3 tools/verify_self.py <sfDir> <outDir> [round]
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import datetime
import json
import os
import sys
import time

import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    rnd = int(sys.argv[3]) if len(sys.argv) > 3 else None
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    sentinel = None
    sentinel_path = os.path.join(out_dir, "verify_sentinel.json")
    if os.path.exists(sentinel_path):
        sentinel = json.load(open(sentinel_path))
    con = duckdb.connect()
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            con.execute(
                f"CREATE VIEW {f[:-8]} AS SELECT * FROM read_parquet('{sf_dir}/{f}')")
    statuses = {}
    oracle_secs = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            statuses[name] = "NO SPARK DUMP"
            continue
        try:
            ora = con.execute(sql).df()
        except Exception as e:
            statuses[name] = f"ORACLE SQL ERROR: {e}"
            continue
        got = pd.read_parquet(spark_path)
        rows_ok = len(ora) == len(got)
        schema_ok = sorted(ora.columns) == sorted(got.columns)
        hash_ok = False
        if rows_ok and schema_ok:
            a, b = norm(ora), norm(got)
            try:
                hash_ok = a.astype(str).equals(b.astype(str))
            except Exception:
                hash_ok = False
        statuses[name] = "OK" if (rows_ok and schema_ok and hash_ok) else \
            f"FAIL rows={rows_ok}({len(ora)}/{len(got)}) schema={schema_ok} hash={hash_ok}"
        oracle_secs[name] = round(time.time() - t0, 1)
        print(f"{name}: {statuses[name]} ({oracle_secs[name]}s oracle+compare)",
              flush=True)
    failed = sorted(n for n, s in statuses.items() if s != "OK")
    doc = {
        "round": rnd,
        "generated": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%MZ (builder round close)"),
        "sf_dir": sf_dir,
        "sentinel": sentinel,
        "queries_total": len(statuses),
        "ok": len(statuses) - len(failed),
        "fail": len(failed),
        "failed_queries": failed,
        "note": "graft.Verify full dump + the driver's columns-sorted/"
                "stable-sort-hash compare, run by the builder at round close "
                "(tools/verify_self.py) — the correctness twin of "
                "BENCH_SELF.json, so the round gate can never be silently "
                "zeroed (r13 postmortem).",
        "queries": statuses,
        "oracle_secs": oracle_secs,
        "oracle_secs_top10": dict(sorted(
            oracle_secs.items(), key=lambda kv: -kv[1])[:10]),
    }
    with open("VERIFY_SELF.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(f"\nVERIFY_SELF.json: {doc['ok']}/{doc['queries_total']} OK"
          + (f", FAILED: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
