#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tooling only;
not part of the Scala engine). Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with every fixture
table registered as a view, sorts columns by name and rows by value, and
diffs. Exit 0 iff all match."""
import json
import math
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
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols, grows = canon(got.columns, got.fetchall())
            exp = con.sql(sql)
            ecols, erows = canon(exp.columns, exp.fetchall())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if [c.lower() for c in gcols] != [c.lower() for c in ecols]:
            print(f"FAIL {name}: columns spark={gcols} duckdb={ecols}")
            n_bad += 1
        elif grows != erows:
            print(f"FAIL {name}: rows spark={len(grows)} duckdb={len(erows)}")
            bad = [(a, b) for a, b in zip(grows, erows) if a != b][:3]
            for a, b in bad:
                print(f"  spark : {a}\n  duckdb: {b}")
            if len(grows) != len(erows):
                sg, se = set(grows), set(erows)
                for r in list(sg - se)[:3]:
                    print(f"  only-spark : {r}")
                for r in list(se - sg)[:3]:
                    print(f"  only-duckdb: {r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(grows)} rows)")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
