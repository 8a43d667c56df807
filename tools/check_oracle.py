#!/usr/bin/env python3
"""Local pre-flight of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Replicates the driver's compare as documented: for each key in
oracle_sql.json, register {sfDir}/{table}.parquet as DuckDB views, run the
oracle SQL, load our parquet dump from <verifyOutDir>/<key>/, sort columns
by name, and compare values exactly (floats: exact equality after a
round-trip through float64 — our hash-match discipline rounds/decimal-sums
so exact equality should hold; report max abs delta when it does not).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for key in sorted(oracles):
        try:
            got = pq.read_table(f"{out_dir}/{key}")
            exp = con.execute(oracles[key]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {key}: exec error: {e}")
            n_fail += 1
            continue
        gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
        if gcols != ecols:
            print(f"FAIL {key}: columns spark={gcols} duckdb={ecols}")
            n_fail += 1
            continue
        if got.num_rows != exp.num_rows:
            print(f"FAIL {key}: rows spark={got.num_rows} duckdb={exp.num_rows}")
            n_fail += 1
            continue
        gd = {c: got.column(c).to_pylist() for c in gcols}
        ed = {c: exp.column(c).to_pylist() for c in ecols}
        bad = []
        for c in gcols:
            for i, (a, b) in enumerate(zip(gd[c], ed[c])):
                # normalize numeric cross-type (e.g. DuckDB Decimal vs double)
                if isinstance(a, float) or isinstance(b, float) or type(a) != type(b):
                    try:
                        fa, fb = float(a), float(b)
                        ok = (fa == fb) or (math.isnan(fa) and math.isnan(fb))
                        if not ok:
                            bad.append((c, i, a, b, abs(fa - fb)))
                        continue
                    except (TypeError, ValueError):
                        pass
                if norm_cell(a) != norm_cell(b):
                    bad.append((c, i, a, b, None))
        # schema check (after value check so we report the more useful error)
        tmismatch = []
        for c in gcols:
            gt, et = str(got.schema.field(c).type), str(exp.schema.field(c).type)
            if gt != et:
                tmismatch.append(f"{c}: spark={gt} duckdb={et}")
        if bad:
            print(f"FAIL {key}: {len(bad)} cell diffs; first: {bad[0]}")
            n_fail += 1
        elif tmismatch:
            print(f"WARN {key}: values match but types differ: {tmismatch}")
            n_pass += 1
        else:
            print(f"PASS {key} ({got.num_rows} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(oracles)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
