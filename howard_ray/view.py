"""Incrementally-maintained materialized aggregate views over an encoded
store (lakehouse IVM: the Iceberg/Delta "incremental refresh" idea built on
this engine's change feed).

A view is a grouped aggregate (COUNT / SUM / MIN / MAX / AVG by a bounded
group key) whose folded state lives NEXT TO the store as a tiny parquet +
state file. ``refresh_view`` reads ONLY the rows appended since the view's
recorded snapshot (``pipeline.read_changes``: live footer blocks minus the
snapshot's, decoded block-parallel), partial-aggregates the delta inside
``map_batches`` (per-batch pandas groupby — the bounded-groupby discipline
of DESIGN.md §8.1), and MERGES the partials into the stored state: COUNT
and SUM add, MIN/MAX combine, AVG is decomposed into a mergeable (sum,
count) pair. A 100-TB store with a daily append cadence refreshes its
dashboards by decoding one day's blocks, not the store.

Soundness: the merge law only holds for INSERTS. Anything that changes
history — row deletes (tombstones), compact / purge / alter folds that
rewrite then-live blocks, or an expired base snapshot — is detected
(tombstone fingerprint + the change feed's own block-diff guard) and the
view REBASELINES with a full recompute instead of serving a stale or wrong
answer. Crash safety mirrors the store: the new state parquet is written
under a snapshot-stamped name first, then ``state.json`` swaps atomically;
a crash between leaves the old state fully readable.

Reference analog: HOWARD materializes per-table stats summaries after each
ingest (howard/objects/variants.py stats family); this is the same product
maintained incrementally instead of recomputed.
"""

from __future__ import annotations

import json
import os
import tempfile

import pandas as pd

import ray

from .manifest import load_footer

_OPS = ("count", "sum", "min", "max", "avg")


def _plan(aggs: dict) -> list[tuple[str, str | None, str]]:
    """Flatten the agg spec into mergeable physical columns:
    (physical_name, source_col, fold_op). AVG splits into __s/__c."""
    plan = []
    for name, spec in aggs.items():
        op, col = spec[0], (spec[1] if len(spec) > 1 else None)
        if op not in _OPS:
            raise ValueError(f"unsupported agg op {op!r} (use {_OPS})")
        if op == "count":
            plan.append((name, None, "count"))
        elif op == "avg":
            plan.append((f"{name}__s", col, "sum"))
            plan.append((f"{name}__c", col, "count_nonnull"))
        else:
            plan.append((name, col, op))
    return plan


def _needed_columns(group_by: list[str], aggs: dict,
                    where: list | None = None) -> list[str]:
    cols = set(group_by)
    for spec in aggs.values():
        if len(spec) > 1 and spec[1]:
            cols.add(spec[1])
    for cond in where or []:
        cols.add(cond[0])
    return sorted(cols)


def _partial(group_by: list[str], plan: list[tuple]):
    """Per-batch partial aggregate (runs inside map_batches)."""
    def part(b: pd.DataFrame) -> pd.DataFrame:
        # dropna=False + sum(min_count=1): SQL semantics — the NULL group
        # survives and an all-null SUM stays NULL, matching the engine's
        # grouped paths (sqlmini) so read_view never disagrees with the
        # same GROUP BY through run_sql
        g = b.groupby(group_by, sort=False, dropna=False)
        out = g.size().rename("__rows").to_frame()
        for name, col, op in plan:
            if op == "count":
                out[name] = g.size()
            elif op == "count_nonnull":
                out[name] = g[col].count()
            elif op == "sum":
                out[name] = g[col].sum(min_count=1)
            else:
                out[name] = g[col].agg(op)
        return out.reset_index()
    return part


def _fold(parts: pd.DataFrame, group_by: list[str],
          plan: list[tuple]) -> pd.DataFrame:
    """Merge partial rows (from any number of batches / the stored state
    / a delta) — the same op folds every level, so refresh composes."""
    how = {"__rows": "sum"}
    for name, _, op in plan:
        how[name] = (op if op in ("min", "max")
                     else (lambda s: s.sum(min_count=1)))
    return (parts.groupby(group_by, sort=False, as_index=False,
                          dropna=False)
            .agg(how))


def _aggregate_dataset(ds: ray.data.Dataset, group_by: list[str],
                       plan: list[tuple]) -> pd.DataFrame:
    parts = ds.map_batches(_partial(group_by, plan),
                           batch_format="pandas").to_pandas()
    if parts.empty:  # typed empty state (a filtered view can match nothing)
        return pd.DataFrame({c: [] for c in
                             [*group_by, "__rows",
                              *(name for name, _, _ in plan)]})
    return _fold(parts, group_by, plan)


def _tomb_fingerprint(store_dir: str) -> str:
    d = os.path.join(store_dir, "tombstones")
    try:
        ent = sorted((f, os.path.getsize(os.path.join(d, f)))
                     for f in os.listdir(d) if f.endswith(".tmb"))
    except OSError:
        ent = []
    return json.dumps(ent)


def _state_path(view_dir: str) -> str:
    return os.path.join(view_dir, "state.json")


def _load_state(view_dir: str) -> dict:
    with open(_state_path(view_dir)) as f:
        return json.load(f)


def _swap_state(view_dir: str, state: dict, folded: pd.DataFrame) -> None:
    """Crash-safe publish: data file first (snapshot-stamped name), then an
    atomic state swap; stale data files are GC'd only after the swap."""
    data = f"view-{state['snapshot_id']:08d}-{state['n_refreshes']}.parquet"
    folded.to_parquet(os.path.join(view_dir, data), index=False)
    state["data"] = data
    fd, tmp = tempfile.mkstemp(dir=view_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _state_path(view_dir))
    for f in os.listdir(view_dir):
        if f.startswith("view-") and f.endswith(".parquet") and f != data:
            try:
                os.remove(os.path.join(view_dir, f))
            except OSError:
                pass


def create_view(store_dir: str, view_dir: str, group_by: list[str],
                aggs: dict, where: list | None = None) -> dict:
    """Materialize the view from a full scan and record the store snapshot
    it reflects. ``aggs``: {out_name: (op, col)}, op in count/sum/min/max/
    avg (count needs no col). ``where``: optional list of decode-predicate
    conjuncts ``(col, op, val)`` — a FILTERED materialized view; the same
    predicate rides into every delta read (zone pruning + pushdown), so
    an incremental refresh of a selective view decodes only the new
    blocks its predicate straddles."""
    from .pipeline import decode_store

    os.makedirs(view_dir, exist_ok=True)
    plan = _plan(aggs)
    where = [list(c) for c in (where or [])]
    footer = load_footer(store_dir)
    ds = decode_store(store_dir,
                      columns=_needed_columns(group_by, aggs, where),
                      predicate=[tuple(c) for c in where] or None,
                      as_of=footer["snapshot_id"])
    folded = _aggregate_dataset(ds, group_by, plan)
    state = {"store": os.path.abspath(store_dir), "group_by": group_by,
             "aggs": {k: list(v) for k, v in aggs.items()},
             "where": where,
             "snapshot_id": footer["snapshot_id"],
             "tombstones": _tomb_fingerprint(store_dir), "n_refreshes": 0}
    _swap_state(view_dir, state, folded)
    return {"mode": "create", "snapshot_id": state["snapshot_id"],
            "groups": len(folded), "rows_aggregated": int(
                folded["__rows"].sum()) if len(folded) else 0}


def refresh_view(view_dir: str) -> dict:
    """Bring the view up to the store's live snapshot.

    - no new snapshot and no tombstone change → **noop** (zero decodes);
    - new appends only → **incremental**: decode exactly the new blocks
      via the change feed, partial-aggregate, merge into the state;
    - deletes / rewrites / expired base snapshot → **rebaseline**: full
      recompute (the only sound answer once history changed)."""
    from .pipeline import decode_store, read_changes

    state = _load_state(view_dir)
    store = state["store"]
    group_by, aggs = state["group_by"], state["aggs"]
    where = [tuple(c) for c in state.get("where") or []]
    plan = _plan(aggs)
    footer = load_footer(store)
    tombs = _tomb_fingerprint(store)

    if footer["snapshot_id"] == state["snapshot_id"] \
            and tombs == state["tombstones"]:
        return {"mode": "noop", "snapshot_id": state["snapshot_id"]}

    mode = "incremental"
    delta_rows = 0
    if tombs != state["tombstones"]:
        mode = "rebaseline"  # deletes pierce history: merge law is void
    else:
        try:
            delta = read_changes(store, state["snapshot_id"],
                                 columns=_needed_columns(group_by, aggs,
                                                         where),
                                 predicate=where or None,
                                 until_snapshot=footer["snapshot_id"])
            dp = _aggregate_dataset(delta, group_by, plan)
        except (ValueError, FileNotFoundError):
            mode = "rebaseline"  # rewrite between snapshots / expired base
    if mode == "rebaseline":
        ds = decode_store(store,
                          columns=_needed_columns(group_by, aggs, where),
                          predicate=where or None,
                          as_of=footer["snapshot_id"])
        folded = _aggregate_dataset(ds, group_by, plan)
        delta_rows = int(folded["__rows"].sum()) if len(folded) else 0
    else:
        old = pd.read_parquet(os.path.join(view_dir, state["data"]))
        delta_rows = int(dp["__rows"].sum()) if len(dp) else 0
        folded = _fold(pd.concat([old, dp], ignore_index=True),
                       group_by, plan) if len(dp) else old

    state["snapshot_id"] = footer["snapshot_id"]
    state["tombstones"] = tombs
    state["n_refreshes"] += 1
    _swap_state(view_dir, state, folded)
    return {"mode": mode, "snapshot_id": state["snapshot_id"],
            "groups": len(folded), "rows_delta": delta_rows}


def read_view(view_dir: str) -> pd.DataFrame:
    """The current view contents (tiny): group columns + one column per
    agg, AVG recomposed from its mergeable (sum, count) pair."""
    state = _load_state(view_dir)
    df = pd.read_parquet(os.path.join(view_dir, state["data"]))
    out = df[state["group_by"]].copy()
    for name, spec in state["aggs"].items():
        if spec[0] == "avg":
            out[name] = df[f"{name}__s"] / df[f"{name}__c"]
        else:
            out[name] = df[name]
    return (out.sort_values(state["group_by"])
            .reset_index(drop=True))
