#!/usr/bin/env python3
"""Builder-side CORRECTNESS artifact writer (dev tooling; not part of the
Scala engine). Mirrors the driver's DuckDB-oracle compare — canonicalize
both sides by sorting columns by name and rows by value — and writes the
per-query record in the driver's CORRECTNESS_r{N}.json row shape:

    {"<query>": {"rows_match": bool|None, "schema_match": bool|None,
                 "hash_match": bool|None, "spark_rows": int,
                 "oracle_rows": int|None, "err": str|None}, ...}

Queries with no oracle SQL record the rows-only shape (err="no_oracle").
Used for the full-surface sf0.1 sweep (VERDICT r15 #4): the artifact
proves the scale-dependent hash-drift class closed corpus-wide.

Field semantics (ADVICE r16 — the key names are the driver's row shape
and cannot change here): "rows_match" records row-COUNT equality only —
equal cardinality with different values reads rows_match=true,
schema_match=true, hash_match=FALSE, so when triaging a red row the
value-level verdict is hash_match; rows_match narrows WHERE it diverged.

    python3 tools/make_correctness.py <sfDir> <verifyOutDir> <outJson>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i].lower() for i in order], out


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    result = {}
    n_green = n_rows_only = n_red = 0
    for name in names:
        rec = {"rows_match": None, "schema_match": None,
               "hash_match": None, "spark_rows": None,
               "oracle_rows": None, "err": None}
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols, grows = canon(got.columns, got.fetchall())
            rec["spark_rows"] = len(grows)
        except Exception as e:
            rec["err"] = f"spark_read: {e}"
            result[name] = rec
            n_red += 1
            continue
        if name not in oracle:
            rec["err"] = "no_oracle"
            result[name] = rec
            n_rows_only += 1
            continue
        try:
            exp = con.sql(oracle[name])
            ecols, erows = canon(exp.columns, exp.fetchall())
        except Exception as e:
            rec["err"] = f"oracle: {e}"
            result[name] = rec
            n_red += 1
            continue
        rec["oracle_rows"] = len(erows)
        rec["rows_match"] = len(grows) == len(erows)
        rec["schema_match"] = gcols == ecols
        rec["hash_match"] = (rec["rows_match"] and rec["schema_match"]
                             and grows == erows)
        result[name] = rec
        if rec["hash_match"]:
            n_green += 1
        else:
            n_red += 1
            print(f"FAIL {name}: rows={rec['rows_match']} "
                  f"schema={rec['schema_match']} "
                  f"spark={len(grows)} duckdb={len(erows)}")
    with open(out_json, "w") as f:
        json.dump(result, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"{n_green} green, {n_rows_only} rows-only, {n_red} red "
          f"-> {out_json}")
    sys.exit(1 if n_red else 0)


if __name__ == "__main__":
    main()
