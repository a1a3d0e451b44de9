#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<name>.parquet + oracle_sql.json), then this script runs each
oracle in DuckDB against the same sf dir and compares row count, schema
(column names sorted), and a value hash.

Usage: python3 scripts/check.py <sfDir> <verifyOut> [queryFilter...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for hashing: floats rounded in-query; timestamps to iso
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            if s.notna().all() and (s % 1 == 0).all():
                s = s.astype("int64")  # HUGEINT→float artifacts
            else:
                s = s.round(6)
        elif s.dtype == object:
            s = s.apply(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
        out[c] = s
    return out


def frame_hash(df: pd.DataFrame) -> str:
    df = canon(df)
    rows = df.astype(str).values.tolist()
    rows.sort()
    import hashlib
    return hashlib.md5("\n".join("|".join(r) for r in rows).encode()).hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        res = {"err": None}
        try:
            files = glob.glob(f"{spark_dir}/*.parquet")
            if not files:
                res["err"] = "no spark output"
                results[name] = res
                continue
            sdf = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            odf = con.execute(oracle[name]).fetchdf()
            res["spark_rows"], res["oracle_rows"] = len(sdf), len(odf)
            res["rows_match"] = len(sdf) == len(odf)
            res["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
            if not res["schema_match"]:
                res["err"] = f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
            res["hash_match"] = (res["rows_match"] and res["schema_match"]
                                 and frame_hash(sdf) == frame_hash(odf))
        except Exception as e:
            res["err"] = str(e)[:300]
        results[name] = res
    ok = sum(1 for r in results.values() if r.get("hash_match"))
    print(json.dumps(results, indent=1, default=str))
    print(f"\n{ok}/{len(results)} hash-matched", file=sys.stderr)
    for n, r in results.items():
        if not r.get("hash_match"):
            print(f"FAIL {n}: {r}", file=sys.stderr)


if __name__ == "__main__":
    main()
