#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle comparison.

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
(tables = parquet files in sfDir), read the Spark parquet result, sort
columns by name, canonicalize rows, and compare as multisets.
"""
import sys, json, duckdb, glob, os

def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(f"{v!r}")
            else:
                vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark result"); n_fail += 1; continue
        try:
            odf = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}"); n_fail += 1; continue
        sdf = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").fetch_arrow_table()
        ocols = sorted(odf.column_names); scols = sorted(sdf.column_names)
        if ocols != scols:
            print(f"{name}: SCHEMA MISMATCH oracle={ocols} spark={scols}"); n_fail += 1; continue
        # PHYSICAL arrow types must match too: the driver's hash sees physical
        # types, so e.g. DuckDB widening sum(BIGINT)->decimal128(38,0) vs
        # Spark's int64 is a hash-red even when every value is identical
        # (this exact class caused 8 false reds in round 1). str() canon
        # below cannot catch it.
        otypes = {c: str(odf.schema.field(c).type) for c in ocols}
        stypes = {c: str(sdf.schema.field(c).type) for c in scols}
        tdiff = {c: (otypes[c], stypes[c]) for c in ocols if otypes[c] != stypes[c]}
        if tdiff:
            print(f"{name}: ARROW TYPE MISMATCH {tdiff}"); n_fail += 1; continue
        orows = canon(odf.select(ocols).to_pylist() and
                      [tuple(d[c] for c in ocols) for d in odf.select(ocols).to_pylist()], ocols)
        srows = canon([tuple(d[c] for c in scols) for d in sdf.select(scols).to_pylist()], scols)
        if orows == srows:
            print(f"{name}: OK ({len(srows)} rows)"); n_pass += 1
        else:
            print(f"{name}: MISMATCH oracle={len(orows)} spark={len(srows)}")
            o_only = [r for r in orows if r not in set(srows)][:3]
            s_only = [r for r in srows if r not in set(orows)][:3]
            print(f"  oracle-only: {o_only}")
            print(f"  spark-only:  {s_only}")
            n_fail += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(d)
        if name not in oracle and os.path.isdir(d):
            n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"{name}: rows-only, {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
