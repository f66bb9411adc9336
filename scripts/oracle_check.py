#!/usr/bin/env python3
"""Local replay of the driver's correctness gate.

Usage: python3 scripts/oracle_check.py [sfDir] [outDir] [name1,name2,...]

The optional third arg restricts the compare to named queries (the
targeted-iteration loop; without it every oracle_sql.json entry runs and
undumped queries report FAIL-no-spark-output noise). For beyond-fixture
scale rehearsals set GRAFT_DUCKDB_MEM (e.g. 100GB) and GRAFT_DUCKDB_TMP
(a spill directory) — sf1 oracles exceed DuckDB's default memory budget.

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already produced
<outDir>/<name>/ parquet dirs + oracle_sql.json. Registers each testdata
table as a DuckDB view, runs every oracle SQL, and value-compares against
the Spark parquet output (columns sorted by name, rows sorted, values
stringified) — mirroring the hash compare described in the brief.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out), [colnames[i] for i in order]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    if os.environ.get("GRAFT_DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
    if os.environ.get("GRAFT_DUCKDB_TMP"):
        con.execute(f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TMP']}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(sqls):
        if only is not None and name not in only:
            continue
        spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_glob:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            # con.sql(...).types carries real DuckDB types (HUGEINT vs
            # BIGINT); the DBAPI cursor.description collapses all numerics
            # to 'NUMBER' and would make this gate a no-op. The relation
            # is planned once and fetched from directly.
            o_rel = con.sql(sqls[name])
            o_types = dict(zip(o_rel.columns, map(str, o_rel.types)))
            o_cols = list(o_rel.columns)
            o_rows, o_cols_s = canon(o_rel.fetchall(), o_cols)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            # guarded like the oracle side: one corrupt/unreadable Spark
            # output records a FAIL for that query instead of crashing
            # the whole gate
            g_rel = con.sql(f"SELECT * FROM read_parquet({spark_glob!r})")
            g_types = dict(zip(g_rel.columns, map(str, g_rel.types)))
            g_cols = list(g_rel.columns)
            g_rows, g_cols_s = canon(g_rel.fetchall(), g_cols)
        except Exception as e:
            print(f"FAIL {name}: spark output error: {e}")
            n_fail += 1
            continue
        # The driver's hash is TYPE-sensitive (DuckDB sum() -> HUGEINT vs
        # Spark BIGINT broke 4 queries in round 1); compare declared types too.
        type_diff = [c for c in g_cols_s if c in o_types
                     and g_types.get(c) != o_types[c]]
        if g_cols_s != o_cols_s:
            print(f"FAIL {name}: columns spark={g_cols_s} oracle={o_cols_s}")
            n_fail += 1
        elif type_diff:
            n_fail += 1
            diffs = ", ".join(
                f"{c}: spark={g_types.get(c)} oracle={o_types[c]}" for c in type_diff)
            print(f"FAIL {name}: type mismatch ({diffs})")
        elif g_rows != o_rows:
            n_fail += 1
            print(f"FAIL {name}: {len(g_rows)} spark rows vs {len(o_rows)} oracle rows")
            for a, b in zip(g_rows, o_rows):
                if a != b:
                    print(f"  first diff:\n   spark : {a}\n   oracle: {b}")
                    break
        else:
            n_pass += 1
            print(f"PASS {name} ({len(g_rows)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
