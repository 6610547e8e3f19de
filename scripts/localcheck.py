#!/usr/bin/env python3
"""Local differential check mimicking the driver's DuckDB-oracle compare.

Usage: python3 scripts/localcheck.py [sfDir] [outDir] [only_query ...]

Reads outDir/oracle_sql.json (written by graft.Verify), registers the
fixture tables as DuckDB views over sfDir, runs each oracle SQL, and
compares against the Spark result parquet in outDir/<name>/.
Columns are sorted by name before comparison (as the driver does).
"""
import duckdb, sys, json, os, math

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        spark_rows = con.execute(
            f"SELECT * FROM '{out}/{name}/*.parquet'").fetchall()
        spark_cols = [d[0] for d in con.description]
        duck = con.execute(sql)
        duck_cols = [d[0] for d in duck.description]
        duck_rows = duck.fetchall()
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        n_fail += 1
        continue
    status = []
    if sorted(spark_cols) != sorted(duck_cols):
        status.append(f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    else:
        # The driver's pandas hash is dtype-sensitive: DuckDB returns
        # HUGEINT for SUM(int) which pandas widens to float64, and that
        # hash-mismatches Spark's int64 even when values are equal
        # (CORRECTNESS_r02: q_text_tokens, q_dedup_embed). Int-width
        # differences (int32 vs int64) are tolerated by the driver.
        try:
            sdt = dict(con.execute(
                f"SELECT * FROM '{out}/{name}/*.parquet'").df().dtypes.astype(str))
            ddt = dict(con.execute(sql).df().dtypes.astype(str))
            kind = lambda t: "int" if "int" in t else ("float" if "float" in t else t)
            for c in sdt:
                if c in ddt and kind(sdt[c]) != kind(ddt[c]):
                    status.append(f"dtype {c}: spark={sdt[c]} duck={ddt[c]}"
                                  " (CAST the oracle, e.g. SUM→BIGINT)")
        except Exception:
            pass
        # Decimal blind spot (r10+r11 q_agg_decimal): pandas maps every
        # DECIMAL(p,s) to `object`, so decimal columns dodge the kind
        # check above — and r11 proved the driver's value hash splits
        # on DECIMAL even when widths AND values are byte-identical
        # on both engines (engine-specific Decimal canonicalization,
        # e.g. trailing-zero rendering). Any DECIMAL-typed OUTPUT
        # column is therefore driver-hash-unsafe: aggregate in decimal
        # for exactness, but CAST the final output to DOUBLE in both
        # engines (value-exact for whole-cent money < 2^53).
        try:
            stype = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE SELECT * FROM '{out}/{name}/*.parquet'").fetchall()}
            dtype = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE {sql}").fetchall()}
            for c in set(stype) | set(dtype):
                a, b = stype.get(c, ""), dtype.get(c, "")
                if a.startswith("DECIMAL") or b.startswith("DECIMAL"):
                    status.append(
                        f"decimal output {c}: spark={a} duck={b} — the"
                        " driver hash canonicalizes DECIMAL per-engine"
                        " (r11); cast the FINAL column to DOUBLE in"
                        " both engines")
        except Exception:
            pass
    if len(spark_rows) != len(duck_rows):
        status.append(f"rows: spark={len(spark_rows)} duck={len(duck_rows)}")
    if not status:
        sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
        didx = [duck_cols.index(c) for c in sorted(duck_cols)]
        # Sort both sides (as the driver's pandas compare does) so the
        # check doesn't depend on positional order, and compare floats
        # with a small relative tolerance to absorb last-ulp drift.
        skey = lambda r: tuple((v is None, str(v)) for v in r)
        srows = sorted(([r[j] for j in sidx] for r in spark_rows), key=skey)
        drows = sorted(([r[j] for j in didx] for r in duck_rows), key=skey)
        mismatches = 0
        first = None
        for i, (srow, drow) in enumerate(zip(srows, drows)):
            for a, b in zip(srow, drow):
                ok = (a == b)
                if not ok and isinstance(a, float) and isinstance(b, float):
                    ok = ((math.isnan(a) and math.isnan(b))
                          or math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9))
                if not ok:
                    mismatches += 1
                    if first is None:
                        first = (i, srow, drow)
                    break
        if mismatches:
            status.append(f"{mismatches} row mismatches; first at row "
                          f"{first[0]}: spark={first[1]} duck={first[2]}")
    if status:
        print(f"FAIL {name}: " + " | ".join(status))
        n_fail += 1
    else:
        print(f"PASS {name} ({len(spark_rows)} rows)")
        n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracles")
sys.exit(1 if n_fail else 0)
