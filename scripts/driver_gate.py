"""Driver-style correctness gate, runnable by hand.

Mirrors the round driver's CORRECTNESS check: for every entry in
``__spark_entry__.queries()``, run the Spark callable at sf0.01 AND the
matching ``oracle_sql()`` string in DuckDB (views registered over the
same parquet tables), then compare row count, column-name set, and the
full value set with columns sorted by name — exact match required.

Usage:  python scripts/driver_gate.py [entry ...]
        (no args = all entries; exits non-zero on any mismatch)
"""

import glob
import importlib.util
import math
import os
import sys
import time

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.01")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver hashes printed values; normalize float noise far below
        # any score's meaningful precision
        return f"{v:.9g}"
    return v


def main(argv):
    sys.path.insert(0, REPO)
    import duckdb
    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries, oracles = mod.queries(), mod.oracle_sql()
    names = argv or sorted(queries)

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false").getOrCreate())
    con = duckdb.connect()
    for p in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        con.execute(f"create view {os.path.basename(p)[:-8]} as "
                    f"select * from read_parquet('{p}')")

    failed = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR)
            scols = list(sdf.columns)
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            srows = sorted(tuple(_norm(r[i]) for i in order)
                           for r in sdf.collect())
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
            drows = sorted(tuple(_norm(r[i]) for i in dorder)
                           for r in cur.fetchall())
            ok_schema = sorted(scols) == sorted(dcols)
            ok_rows = len(srows) == len(drows)
            ok_vals = srows == drows
            status = "GREEN" if (ok_schema and ok_rows and ok_vals) \
                else "FAIL"
            if status == "FAIL":
                failed.append(name)
            print(f"{status:5s} {name:28s} rows={len(srows)}/"
                  f"{len(drows)} schema={ok_schema} vals={ok_vals} "
                  f"({time.time()-t0:.1f}s)", flush=True)
            if status == "FAIL" and not ok_vals and ok_rows:
                for a, b in zip(srows, drows):
                    if a != b:
                        print(f"      first diff: spark={a} duck={b}")
                        break
        except Exception as e:  # noqa: BLE001 — report, keep gating
            failed.append(name)
            print(f"ERROR {name:28s} {type(e).__name__}: {e}",
                  flush=True)
    print(f"\n{len(names) - len(failed)}/{len(names)} green"
          + (f"; FAILED: {failed}" if failed else ""))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
