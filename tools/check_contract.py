"""Replicates the driver's contract end-to-end (see
.claude/skills/verify/SKILL.md):

- every ``oracle_sql()`` query is compared against DuckDB on the same
  parquet tables (row count + sorted-column schema + exact values);
- every remaining ``queries()`` entry (rows-only at the driver) is
  executed and counted, so a query that crashes is caught here and not
  first by the driver.

Usage::

    python tools/check_contract.py [sf_dir] [only_query,only_query,...]
    python tools/check_contract.py /root/testdata/sf0.01
    python tools/check_contract.py /root/testdata/sf0.01 --sql-only
    python tools/check_contract.py /root/testdata/sf0.01 --sample 50 --seed 3

``--sample N [--seed S]`` mirrors the round driver's sampling: a
seeded uniform pick of N query names (oracle and rows-only pooled,
sorted for determinism) — run it with a few seeds before a snapshot so
any future driver pick is pre-verified.

Exit code 1 on any failure.
"""
import random
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa

import ray

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
rest = sys.argv[2:]
sql_only = "--sql-only" in rest
only = None
sample_n = None
seed = 0
for i, a in enumerate(rest):
    if a == "--sample":
        sample_n = int(rest[i + 1])
    elif a == "--seed":
        seed = int(rest[i + 1])
    elif not a.startswith("--") and (i == 0 or rest[i - 1] not in ("--sample", "--seed")):
        only = a.split(",")

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)
sys.path.insert(0, "/root/repo")
import __ray_entry__ as E  # noqa: E402

con = duckdb.connect()
for t in (
    "region nation customer supplier part orders "
    "lineitem events documents embeddings"
).split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
    )

qs = E.queries()
oracles = E.oracle_sql()
if sample_n is not None:
    # an explicit query list narrows the sampling pool instead of being
    # silently discarded (ADVICE r4)
    pool = sorted(only) if only else sorted(qs)
    only = random.Random(seed).sample(pool, min(sample_n, len(pool)))
    print(f"sampled {len(only)} of {len(pool)} queries (seed={seed})")
fails = []

for name, sql in oracles.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        res = qs[name](sf_dir)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        if not isinstance(res, pd.DataFrame):
            res = pd.DataFrame(res)
        exp = con.execute(sql).fetchdf()
    except Exception as ex:  # noqa: BLE001
        print(f"FAIL {name:28s} {type(ex).__name__}: {str(ex)[:160]}")
        fails.append(name)
        continue
    ok_rows = len(res) == len(exp)
    cols_r, cols_e = sorted(res.columns), sorted(exp.columns)
    ok_schema = cols_r == cols_e
    ok_vals = False
    detail: list[str] = []
    if ok_rows and ok_schema:
        r = res[cols_r].sort_values(cols_r).reset_index(drop=True)
        x = exp[cols_r].sort_values(cols_r).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(r, x, check_dtype=False, check_exact=True)
            ok_vals = True
        except AssertionError as e:
            detail = str(e).splitlines()[:6]
    status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
    print(
        f"{status:4s} {name:28s} rows={len(res)}/{len(exp)} "
        f"schema={ok_schema} vals={ok_vals} {time.time() - t0:.1f}s"
    )
    if status == "FAIL":
        fails.append(name)
        if not ok_schema:
            print("   ray:", cols_r, "\n   sql:", cols_e)
        elif detail:
            print("   " + "\n   ".join(detail))

if not sql_only:
    for name, fn in sorted(qs.items()):
        if name in oracles or (only and name not in only):
            continue
        t0 = time.time()
        try:
            r = fn(sf_dir)
            if hasattr(r, "count") and not isinstance(r, pd.DataFrame):
                n = r.count()
            elif isinstance(r, pd.DataFrame):
                n = len(r)
            elif isinstance(r, pa.Table):
                n = r.num_rows
            else:
                n = -1
            print(f"OK   {name:28s} rows-only n={n} {time.time() - t0:.1f}s")
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name:28s} {type(ex).__name__}: {str(ex)[:160]}")
            fails.append(name)

print("FAILS:", fails if fails else "none")
ray.shutdown()
sys.exit(1 if fails else 0)
