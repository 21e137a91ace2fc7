#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and hash-compare (columns sorted by
name, rows sorted, canonical value formatting)."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    import decimal
    if isinstance(v, decimal.Decimal):
        # Keep decimals distinct from ints/floats: the driver's gate is
        # type-sensitive (r2 lesson: uncast DuckDB integer sum() -> HUGEINT ->
        # decimal128 hashed differently from Spark's BIGINT).
        return f"DEC:{v}"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        tbl = pq.read_table(files[0])
        s_cols = tbl.column_names
        s_rows = [tuple(row[c] for c in s_cols) for row in tbl.to_pylist()]
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(s_rows)})"
            continue
        try:
            # Fetch via arrow, NOT fetchall(): fetchall() unboxes DuckDB
            # HUGEINT to Python int, hiding the type the driver's hash
            # sees (r3 lesson: uncast window sum() -> HUGEINT -> driver
            # red while fetchall-based local sweep stayed green). Arrow
            # exports HUGEINT as decimal128, which canon() marks DEC:.
            dtbl = con.execute(oracle[name]).fetch_arrow_table()
            d_cols = dtbl.column_names
            d_rows = [tuple(row[c] for c in d_cols) for row in dtbl.to_pylist()]
        except Exception as e:
            results[name] = "ORACLE_SQL_ERROR: " + str(e).split("\n")[0][:200]
            continue
        sc, sr = canon_rows(s_cols, s_rows)
        dc, dr = canon_rows(d_cols, d_rows)
        if sc != dc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} duck={dc}"
        elif len(sr) != len(dr):
            results[name] = f"ROWCOUNT spark={len(sr)} duck={len(dr)}"
        elif sr != dr:
            bad = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            results[name] = f"VALUE_MISMATCH n={sum(1 for a,b in zip(sr,dr) if a!=b)} first={bad[0] if bad else '?'}"
        else:
            results[name] = f"OK({len(sr)})"
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k in sorted(results):
        print(f"{'PASS' if results[k].startswith('OK') else 'FAIL' if not results[k].startswith('ROWS_ONLY') else 'WEAK'}  {k}: {results[k]}")
    print(f"== {n_ok}/{len(results)} hash-match, "
          f"{sum(1 for v in results.values() if v.startswith('ROWS_ONLY'))} rows-only")

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
