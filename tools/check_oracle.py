#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir
tables, sorts columns by name + rows by all values, and compares
exactly (with a float report when exact fails).
"""
import json, math, numbers, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = os.path.join(outdir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark result dir"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
            want = con.execute(oracle[name]).df()
            # Physical-schema guard: pandas flattens DECIMAL and
            # float64 to the same dtype, which let r11's src_jdbc ship
            # a DECIMAL(28,6) column past this gate while the driver's
            # type-kind-sensitive hash failed it. Inspect the written
            # parquet's DuckDB logical types directly: any DECIMAL or
            # nested (LIST/STRUCT/MAP) column in a declared output is
            # a gate failure here, before the value compare.
            phys = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{spark_dir}/*.parquet')"
            ).fetchall()
            bad_types = [(c, t) for c, t, *_ in phys
                         if t.startswith("DECIMAL") or "[" in t
                         or t.startswith(("STRUCT", "MAP", "UNION"))]
            if bad_types:
                print(f"FAIL {name}: non-driver-hashable physical column type(s) "
                      f"{bad_types} — cast decimals to double, stringify nested")
                n_fail += 1; continue
            # ns-range guard (r13 evt_scd2 incident): the driver's
            # Arrow/pandas hasher reads parquet timestamps as
            # datetime64[ns], so any value outside [1677-09-21,
            # 2262-04-11] silently WRAPS (year 9999 → 1816) even though
            # DuckDB compares it correctly. Reject such values here,
            # before the value compare, so an out-of-range sentinel can
            # never ship again.
            ts_cols = [c for c, t, *_ in phys if t.startswith("TIMESTAMP")]
            if ts_cols:
                checks = " OR ".join(
                    f"(\"{c}\" IS NOT NULL AND (\"{c}\" < TIMESTAMP '1677-09-22' "
                    f"OR \"{c}\" > TIMESTAMP '2262-04-10'))" for c in ts_cols)
                n_oob = con.execute(
                    f"SELECT count(*) FROM read_parquet('{spark_dir}/*.parquet') "
                    f"WHERE {checks}").fetchone()[0]
                if n_oob:
                    print(f"FAIL {name}: {n_oob} timestamp value(s) outside the "
                          f"datetime64[ns] range in {ts_cols} — the driver hasher "
                          f"wraps these; use an ns-safe sentinel (< 2262-04-11)")
                    n_fail += 1; continue
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}"); n_fail += 1; continue
        g = got[gc].sort_values(gc, kind="mergesort").reset_index(drop=True)
        w = want[wc].sort_values(wc, kind="mergesort").reset_index(drop=True)
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        # The driver's hash is type-KIND-sensitive: DuckDB HUGEINT (an
        # uncast integer SUM) lands in pandas as float64 while Spark's
        # BIGINT is int64, and 735.0 hash-diverges from 735 — that
        # shipped three r5 failures past the old value-only comparison.
        # Integer WIDTH (int32 vs int64) is driver-tolerated (19 r5
        # hash-green queries mix them), so compare dtype.kind, not the
        # exact dtype.
        dt_bad = [(c, str(g[c].dtype), str(w[c].dtype))
                  for c in gc if g[c].dtype.kind != w[c].dtype.kind]
        if dt_bad:
            print(f"FAIL {name}: dtype kinds diverge (spark vs oracle): {dt_bad}")
            n_fail += 1; continue
        bad = []
        for c in gc:
            for i, (a, b) in enumerate(zip(g[c], w[c])):
                if a is None and b is None:
                    continue
                try:
                    if isinstance(a, float) or isinstance(b, float):
                        if a == b or (isinstance(a, float) and isinstance(b, float)
                                      and math.isnan(a) and math.isnan(b)):
                            continue
                        bad.append((c, i, a, b,
                                    abs(a - b) if a is not None and b is not None else None))
                    # integer width is driver-tolerated; any other
                    # per-value type split (HUGEINT→int vs Decimal, str
                    # vs int inside object columns) is not
                    elif isinstance(a, numbers.Integral) and isinstance(b, numbers.Integral):
                        if int(a) != int(b):
                            bad.append((c, i, a, b, None))
                    elif type(a) is not type(b):
                        bad.append((c, i, f"{a}:{type(a).__name__}",
                                    f"{b}:{type(b).__name__}", None))
                    elif a != b:
                        bad.append((c, i, a, b, None))
                except Exception:
                    bad.append((c, i, a, b, None))
                if len(bad) > 3:
                    break
            if len(bad) > 3:
                break
        if bad:
            print(f"FAIL {name}: {len(g)} rows, first diffs: {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    # queries without oracle: rows-only
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

def selftest():
    """Prove the ns-range guard trips: build a result dir whose parquet
    carries a year-9999 timestamp (values DuckDB compares as equal, so
    without the guard this would PASS and then hash-fail in the
    driver's Arrow read — the r13 evt_scd2 incident) and assert main()
    fails it for the datetime64[ns] reason."""
    import io, tempfile
    from contextlib import redirect_stdout
    out = tempfile.mkdtemp(prefix="oracle-selftest-")
    con = duckdb.connect()
    os.makedirs(os.path.join(out, "guard_case"))
    con.execute(
        "COPY (SELECT TIMESTAMP '9999-12-31 00:00:00' AS ts, 1::BIGINT AS v) "
        f"TO '{out}/guard_case/part-0.parquet' (FORMAT PARQUET)")
    with open(os.path.join(out, "oracle_sql.json"), "w") as f:
        json.dump({"guard_case":
                   "SELECT TIMESTAMP '9999-12-31 00:00:00' AS ts, 1::BIGINT AS v"}, f)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(out, out)  # sfdir unused: the oracle needs no tables
    text = buf.getvalue()
    assert rc == 1 and "datetime64[ns]" in text, \
        f"ns-range guard did NOT trip on a year-9999 column:\n{text}"
    print("selftest OK: ns-range guard trips on year-9999 timestamps")
    return 0

if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
