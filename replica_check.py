#!/usr/bin/env python
"""Full engine-vs-DuckDB replica of the driver's correctness gate over an
arbitrary sf directory — the round-5 scale-decade evidence tool.

    GRAFT_TEST_SF=/tmp/testdata_sf1 python replica_check.py \
        [--out /tmp/replica_sf1.json] [--oracle-timeout 900] [-k substr] \
        [--resume /tmp/replica_sf1.jsonl]

With --resume PATH, each query's row is appended to PATH as it lands and
queries already present in PATH are skipped on relaunch — a killed run
(host restart, session death) continues where it stopped instead of
starting over.

Runs EVERY registry query (not just the driver window): engine result at
RAY_GRAFT_CPUS (default 32), oracle SQL through DuckDB on the same
parquet, driver-style compare (row count + column names +
order-insensitive values). Records per-query engine/oracle wall seconds
so two runs at different SFs yield the growth-factor table BASELINE.md
wants. Oracles that exceed --oracle-timeout are interrupted and recorded
as oracle_timeout (the engine row count still lands)."""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import threading
import time

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.01")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck(sql: str, timeout_s: float):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    timer = threading.Timer(timeout_s, con.interrupt)
    timer.start()
    try:
        return con.execute(sql).fetchdf()
    finally:
        timer.cancel()
        con.close()


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def values_equal(a, b) -> bool:
    for c in a.columns:
        for x, y in zip(a[c].tolist(), b[c].tolist()):
            if isinstance(x, float) or isinstance(y, float):
                fx, fy = float(x), float(y)
                if math.isnan(fx) and math.isnan(fy):
                    continue
                if fx != fy:
                    return False
            elif x != y:
                return False
    return True


def emit(resume_path, name, row) -> None:
    print(json.dumps({name: row}), flush=True)
    if resume_path:
        with open(resume_path, "a") as f:
            f.write(json.dumps({name: row}) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--oracle-timeout", type=float, default=900.0)
    ap.add_argument("-k", default="", help="only queries containing substr")
    ap.add_argument("--resume", default=None,
                    help="JSONL path: append rows as they land, skip queries already recorded")
    args = ap.parse_args()

    done: dict = {}
    if args.resume and os.path.exists(args.resume):
        with open(args.resume) as f:
            for line in f:
                line = line.strip()
                if line:
                    done.update(json.loads(line))
        print(f"resume: {len(done)} queries already recorded", flush=True)

    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    from docling_api_ray.registry import all_oracles, all_queries

    queries, oracles = all_queries(), all_oracles()
    results = dict(done)
    for name, fn in queries.items():
        if args.k and args.k not in name:
            continue
        if name in done:
            continue
        row: dict = {}
        t0 = time.time()
        try:
            import pandas as pd
            import pyarrow as pa

            res = fn(SF_DIR)
            if isinstance(res, pd.DataFrame):
                eng = res
            elif isinstance(res, pa.Table):
                eng = res.to_pandas()
            else:  # ray.data.Dataset
                eng = res.to_pandas()
            row["engine_sec"] = round(time.time() - t0, 3)
            row["engine_rows"] = len(eng)
        except Exception as exc:
            row["engine_sec"] = round(time.time() - t0, 3)
            row["err"] = f"engine: {type(exc).__name__}: {exc}"
            results[name] = row
            emit(args.resume, name, row)
            continue
        sql = oracles.get(name)
        if sql is None:
            row["err"] = "no_oracle"
        else:
            t1 = time.time()
            try:
                want = duck(sql, args.oracle_timeout)
                row["oracle_sec"] = round(time.time() - t1, 3)
                row["oracle_rows"] = len(want)
                row["rows_match"] = len(eng) == len(want)
                row["schema_match"] = sorted(eng.columns) == sorted(want.columns)
                row["hash_match"] = (
                    row["rows_match"]
                    and row["schema_match"]
                    and values_equal(canon(eng), canon(want))
                )
            except Exception as exc:
                row["oracle_sec"] = round(time.time() - t1, 3)
                msg = str(exc)
                row["err"] = (
                    "oracle_timeout"
                    if "INTERRUPT" in msg.upper() or "interrupted" in msg
                    else f"oracle: {type(exc).__name__}: {msg[:200]}"
                )
        results[name] = row
        emit(args.resume, name, row)
    ray.shutdown()
    n_hash = sum(1 for r in results.values() if r.get("hash_match"))
    n_sql = sum(1 for r in results.values() if "hash_match" in r)
    summary = {
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "queries": len(results),
        "sql_checked": n_sql,
        "hash_green": n_hash,
        "rows_only": sum(1 for r in results.values() if r.get("err") == "no_oracle"),
        "failures": {
            k: r for k, r in results.items()
            if ("hash_match" in r and not r["hash_match"]) or
               ("err" in r and r["err"] != "no_oracle")
        },
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
