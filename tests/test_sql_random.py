"""Randomized cross-engine equivalence trials for the round-3 SQL surface
(windows / CTEs / UNION / derived tables): deterministic seeds generate
small random tables with nulls, skew and ties; the same SQL text runs
through sqlmini and DuckDB and must hash-match. Catches semantics drift
the curated fixtures can't (tie layouts, empty partitions, null keys)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from howard_ray.sqlmini import run_sql


@pytest.fixture(scope="module")
def rand_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("sqlrand")
    dirs = {}
    for seed in (11, 23, 47):
        d = root / f"s{seed}"
        d.mkdir()
        rng = np.random.default_rng(seed)
        n = int(rng.integers(200, 600))
        t = pa.table({
            "k": pa.array(rng.integers(0, 12, n)),
            # ts has heavy TIES (small domain) to stress peer frames
            "ts": pa.array(rng.integers(0, 40, n)),
            "rid": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(np.round(rng.normal(50, 20, n), 2)),
            "tag": pa.array(rng.choice(["a", "b", "c"], n)),
        })
        pq.write_table(t, str(d / "events.parquet"))
        dirs[seed] = str(d)
    return dirs


def _both(sf_dir: str, sql: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{os.path.join(sf_dir, 'events.parquet')}'")
    ora = con.execute(sql).df().reset_index(drop=True)
    mine = run_sql(sf_dir, sql).reset_index(drop=True)
    return mine, ora


SQLS = [
    # running aggregates under heavy order-key ties (RANGE peers)
    """SELECT rid, ROUND(SUM(v) OVER (PARTITION BY k ORDER BY ts, rid), 2)
AS rv, RANK() OVER (PARTITION BY k ORDER BY ts) AS r
FROM events ORDER BY rid""",
    # lag/lead across small partitions (some have 1 row)
    """SELECT rid, LAG(v) OVER (PARTITION BY k ORDER BY ts, rid) AS pv,
LEAD(tag) OVER (PARTITION BY k ORDER BY ts, rid) AS nt
FROM events ORDER BY rid""",
    # CTE + derived table + union over the same random data
    """WITH agg AS (SELECT k, COUNT(*) AS n, ROUND(SUM(v), 2) AS sv
FROM events GROUP BY k)
SELECT 'agg' AS src, COUNT(*) AS n FROM agg
UNION ALL SELECT 'raw' AS src, COUNT(*) AS n FROM events ORDER BY src""",
    """SELECT tag, COUNT(*) AS n, ROUND(SUM(sv), 2) AS tot FROM
(SELECT k, tag, ROUND(SUM(v), 2) AS sv FROM events GROUP BY k, tag) x
GROUP BY tag ORDER BY tag""",
    # partition-wide aggregates + WHERE composition
    """SELECT rid, COUNT(*) OVER (PARTITION BY tag) AS nt,
ROUND(MIN(v) OVER (PARTITION BY tag), 2) AS mn
FROM events WHERE v >= 30 ORDER BY rid""",
]


@pytest.mark.parametrize("seed", [11, 23, 47])
@pytest.mark.parametrize("qi", range(len(SQLS)))
def test_random_tables_match_duckdb(ray_session, rand_dir, seed, qi):
    mine, ora = _both(rand_dir[seed], SQLS[qi])
    pd.testing.assert_frame_equal(mine, ora, check_dtype=False)


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    """Tables with NULLs in group keys, aggregate inputs and strings."""
    root = tmp_path_factory.mktemp("sqlnull")
    dirs = {}
    for seed in (5, 19):
        d = root / f"s{seed}"
        d.mkdir()
        rng = np.random.default_rng(seed)
        n = int(rng.integers(300, 700))
        k = rng.integers(0, 6, n).astype(float)
        k[rng.random(n) < 0.15] = np.nan
        v = np.round(rng.normal(10, 5, n), 2)
        v[rng.random(n) < 0.2] = np.nan
        tag = rng.choice(["x", "y", None], n, p=[0.45, 0.45, 0.10])
        t = pa.table({
            "k": pa.array([None if np.isnan(x) else int(x) for x in k],
                          type=pa.int64()),
            "v": pa.array([None if np.isnan(x) else float(x) for x in v]),
            "tag": pa.array(list(tag)),
            "rid": pa.array(np.arange(n, dtype=np.int64)),
        })
        pq.write_table(t, str(d / "events.parquet"))
        dirs[seed] = str(d)
    return dirs


NULL_SQLS = [
    # NULL group keys form their own group (SQL semantics)
    """SELECT k, COUNT(*) AS n, COUNT(v) AS nv, ROUND(SUM(v), 2) AS sv
FROM events GROUP BY k ORDER BY k""",
    # NULL string key + HAVING
    """SELECT tag, COUNT(*) AS n FROM events GROUP BY tag
HAVING COUNT(*) >= 10 ORDER BY tag""",
    # WHERE drops NULL comparisons (Kleene), aggregates skip NULL inputs
    """SELECT tag, ROUND(AVG(v), 4) AS av FROM events
WHERE v >= 5 GROUP BY tag ORDER BY tag""",
    # two-key grouping with NULLs in both keys
    """SELECT k, tag, COUNT(*) AS n FROM events GROUP BY k, tag
ORDER BY k, tag""",
    # windows over null-heavy data (round-4 Arrow fold): null partition
    # keys form one partition, null order keys sort last, running SUM
    # skips null inputs without breaking the accumulation (RANGE peers)
    """SELECT rid, ROUND(SUM(v) OVER (PARTITION BY k ORDER BY rid), 2)
AS rv FROM events ORDER BY rid""",
    """SELECT rid, ROW_NUMBER() OVER (PARTITION BY tag ORDER BY v, rid)
AS rn, LAG(v) OVER (PARTITION BY tag ORDER BY v, rid) AS pv
FROM events ORDER BY rid""",
    """SELECT rid, COUNT(*) OVER (PARTITION BY k) AS nk,
ROUND(AVG(v) OVER (PARTITION BY k), 4) AS av
FROM events ORDER BY rid""",
    # RANK over a null-heavy order key (nulls are peers of each other)
    """SELECT rid, RANK() OVER (PARTITION BY tag ORDER BY k) AS r
FROM events ORDER BY rid""",
    # DESC order keys with nulls: NULLS LAST both directions (DuckDB
    # default; the Arrow fold's -x negation keeps NaN last)
    """SELECT rid, RANK() OVER (PARTITION BY tag ORDER BY k DESC) AS r,
LAG(v) OVER (PARTITION BY tag ORDER BY k DESC, rid) AS pv
FROM events ORDER BY rid""",
]


@pytest.mark.parametrize("seed", [5, 19])
@pytest.mark.parametrize("qi", range(len(NULL_SQLS)))
def test_null_heavy_tables_match_duckdb(ray_session, null_dir, seed, qi):
    mine, ora = _both(null_dir[seed], NULL_SQLS[qi])
    pd.testing.assert_frame_equal(mine, ora, check_dtype=False)


def test_window_int_sum_type_stable_and_exact(ray_session, tmp_path):
    """ADVICE r4 #4: (a) one alias emits ONE output type even when nulls
    fall only in SOME partitions (the int/float decision is schema-based,
    not per-bucket); (b) null-free int64 running SUM is exact above 2^53
    (no float64 cumsum round-trip)."""
    d = tmp_path / "wint"
    d.mkdir()
    n = 400
    k = (np.arange(n) % 8).astype(np.int64)
    rid = np.arange(n, dtype=np.int64)
    # nulls ONLY in partitions k<2 -> buckets disagree under per-bucket typing
    iv = [None if (kk < 2 and i % 5 == 0) else int(i)
          for i, kk in enumerate(k)]
    big = (1 << 55) + rid  # running sums far above 2^53, unit-level deltas
    t = pa.table({"k": pa.array(k), "rid": pa.array(rid),
                  "iv": pa.array(iv, type=pa.int64()),
                  "big": pa.array(big)})
    pq.write_table(t, str(d / "events.parquet"))

    sql = ("SELECT rid, SUM(iv) OVER (PARTITION BY k ORDER BY rid) AS s, "
           "SUM(big) OVER (PARTITION BY k ORDER BY rid) AS sb "
           "FROM events ORDER BY rid")
    mine, ora = _both(str(d), sql)
    # exactness vs PYTHON-int expected sums — comparing against DuckDB's
    # fetchdf would be a false negative: its HUGEINT window SUM converts
    # to float64 in the dataframe, reproducing the same rounding a buggy
    # float64 engine path would make
    run: dict = {}
    exp = []
    for kk, bb in zip(k, big):
        run[kk] = run.get(kk, 0) + int(bb)
        exp.append(run[kk])
    assert mine["sb"].dtype.kind == "i", mine["sb"].dtype
    assert mine["sb"].tolist() == exp
    pd.testing.assert_frame_equal(mine.drop(columns=["sb"]),
                                  ora.drop(columns=["sb"]),
                                  check_dtype=False)
