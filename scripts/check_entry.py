"""Local twin of the driver's correctness gate: run every queries() entry
at sf0.01 and diff against oracle_sql() via DuckDB (row count + column
names + order-insensitive values)."""

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from resin_spark.session import make_session  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def main():
    spark = make_session("local[8]", "check_entry", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    e = entry_mod.entry(spark)
    print(f"entry: rows={e.count()} schema={e.columns}")

    qs = entry_mod.queries()
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        df = fn(spark, SF)
        rows = df.collect()
        cols = sorted(df.columns)
        got = sorted(
            tuple(norm(r[c]) for c in cols) for r in rows
        )
        if name not in oracles:
            print(f"{name}: rows-only, rows={len(rows)} cols={cols}")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols_raw = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as ex:
            print(f"{name}: ORACLE SQL ERROR: {ex}")
            failed.append(name)
            continue
        ocols = sorted(ocols_raw)
        want = sorted(
            tuple(norm(r[ocols_raw.index(c)]) for c in ocols) for r in orows
        )
        ok_cols = cols == ocols
        ok_rows = len(got) == len(want)
        ok_vals = got == want
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "MISMATCH"
        print(f"{name}: {status} rows={len(got)}/{len(want)} cols={cols}"
              + ("" if ok_cols else f" vs {ocols}"))
        if status != "OK":
            failed.append(name)
            for g, w in list(zip(got, want))[:4]:
                if g != w:
                    print(f"   got  {g}\n   want {w}")
            if len(got) != len(want):
                print(f"   extra got: {[x for x in got if x not in want][:3]}")
                print(f"   extra want: {[x for x in want if x not in got][:3]}")
    print("FAILED:" if failed else "ALL OK", failed)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
