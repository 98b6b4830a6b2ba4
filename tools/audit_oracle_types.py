#!/usr/bin/env python3
"""Oracle result-TYPE audit (dev tooling; not part of the Scala engine).

The driver's hash canonicalization treats DuckDB HUGEINT (int128) unlike
BIGINT — it round-trips int128 through float — so an oracle whose values
match Spark's BIGINT column exactly can still hash-mismatch (round-13's
q_tokenizer_fertility). DuckDB widens `sum(BIGINT)` to HUGEINT, so any
bare `sum(` over an integer column is a latent instance of the class.

This script runs every oracle in <verifyOutDir>/oracle_sql.json under
DuckDB with a LIMIT-0-style describe and flags any result column whose
DuckDB type is HUGEINT/UHUGEINT (or DECIMAL with precision > 18, same
canonicalization path). Exit 0 iff no oracle emits an int128 column.

    python3 tools/audit_oracle_types.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD_TYPES = ("HUGEINT", "UHUGEINT")


def is_bad(type_name: str) -> bool:
    t = type_name.upper()
    if t in BAD_TYPES:
        return True
    if t.startswith("DECIMAL("):
        prec = int(t[len("DECIMAL("):].split(",")[0])
        return prec > 18
    return False


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
            rel = con.sql(sql)
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_bad += 1
            continue
        flagged = [(c, t) for c, t in cols if is_bad(t)]
        if flagged:
            n_bad += 1
            print(f"FAIL {name}: int128-typed oracle columns {flagged}")
    print(f"{'OK' if n_bad == 0 else 'BAD'}: "
          f"{len(oracle) if not only else len(only)} oracles audited, "
          f"{n_bad} with int128 columns")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
