#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 devtools/compare.py <sfDir> <verifyOutDir> [query ...]

Runs each oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over
the parquet tables in <sfDir>, and compares against the Spark result
parquet the graft.Verify main wrote to <verifyOutDir>/<name>/.

Compare contract (matches the driver's): row count, column-name set,
exact value equality with columns sorted by name (two-way EXCEPT ALL,
NO casts), AND DuckDB-described type equality per column. The driver's
hash is representation-sensitive (no casts), so an oracle column that
comes back HUGEINT/DECIMAL where the Spark parquet reads BIGINT is a
driver hash FAIL even when the values are equal — this script flags
those as TYPE mismatches instead of masking them with a cast.

Dev tooling only — the Scala library has no Python dependency.
"""
import duckdb, json, sys, glob, os

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        src = p if os.path.isfile(p) else f"{p}/*.parquet"
        if glob.glob(p) or glob.glob(src):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
            if t == "events":
                # synthetic scale dirs store ts as BIGINT epoch-nanos;
                # oracles are written against TIMESTAMP (epoch_us-based),
                # so surface the same logical value (micros are exact)
                (ts_type,) = [r[1] for r in con.execute("DESCRIBE events").fetchall() if r[0] == "ts"]
                if ts_type == "BIGINT":
                    con.execute(
                        "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                        f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{src}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(n for n in oracles if not only or n in only)
    n_pass = n_fail = 0
    for name in names:
        try:
            con.execute(
                f"CREATE OR REPLACE VIEW sparkres AS SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            con.execute(f"CREATE OR REPLACE TABLE oracleres AS ({oracles[name]})")
            atypes = dict((r[0], r[1]) for r in con.execute("DESCRIBE sparkres").fetchall())
            btypes = dict((r[0], r[1]) for r in con.execute("DESCRIBE oracleres").fetchall())
            if set(atypes) != set(btypes):
                print(f"FAIL {name}: columns spark={sorted(atypes)} oracle={sorted(btypes)}")
                n_fail += 1
                continue
            tdiff = {c: (atypes[c], btypes[c]) for c in atypes if atypes[c] != btypes[c]}
            if tdiff:
                print(f"FAIL {name}: TYPE mismatch (driver hash is no-cast) {tdiff}")
                n_fail += 1
                continue
            cols = sorted(atypes)
            sel_a = ", ".join(f'"{c}"' for c in cols)
            sel_b = ", ".join(f'"{c}"' for c in cols)
            na = con.execute("SELECT count(*) FROM sparkres").fetchone()[0]
            nb = con.execute("SELECT count(*) FROM oracleres").fetchone()[0]
            d1 = con.execute(
                f"SELECT count(*) FROM (SELECT {sel_a} FROM sparkres EXCEPT ALL SELECT {sel_b} FROM oracleres)").fetchone()[0]
            d2 = con.execute(
                f"SELECT count(*) FROM (SELECT {sel_b} FROM oracleres EXCEPT ALL SELECT {sel_a} FROM sparkres)").fetchone()[0]
            if na == nb and d1 == 0 and d2 == 0:
                print(f"PASS {name} rows={na}")
                n_pass += 1
            else:
                print(f"FAIL {name}: spark_rows={na} oracle_rows={nb} only_spark={d1} only_oracle={d2}")
                n_fail += 1
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass}/{n_pass + n_fail} PASS")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
