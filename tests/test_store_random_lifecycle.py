"""Randomized store-lifecycle equivalence trials: a seeded random
sequence of lifecycle operations (append epochs, MERGE upserts,
tombstone deletes, compaction, recluster, purge, vacuum) runs against
BOTH the encoded store and an in-memory Arrow mirror; after every step
the full decode must be bit-identical to the mirror, and surviving
snapshots must replay the historical state with erasure semantics
(later deletes/upsert-tombstones pierce old snapshots — the documented
GDPR shape). Catches op-interaction bugs the per-op test files can't
(tombstones across append epochs, upsert-after-delete, compaction of
mixed-epoch tombstoned blocks, footer-swap bookkeeping)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from howard_ray.fixtures import make_tokens_corpus
from howard_ray.manifest import load_footer
from howard_ray.ops.util import to_table
from howard_ray.pipeline import (append_to_store, compact_store,
                                 decode_store, delete_where, encode_dataset,
                                 purge_deletes, recluster_store,
                                 upsert_to_store, vacuum_store)

MASTER = make_tokens_corpus(4200, seed=7)


def _canon(t: pa.Table) -> pa.Table:
    t = t.select(sorted(t.column_names))
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


def _assert_equal(store: str, mirror: pa.Table, ctx: str,
                  as_of: int | None = None) -> None:
    dec = _canon(to_table(decode_store(store, as_of=as_of)))
    mir = _canon(mirror)
    assert dec.num_rows == mir.num_rows, \
        f"{ctx}: {dec.num_rows} vs {mir.num_rows} rows"
    dec = dec.cast(mir.schema)
    assert dec.equals(mir), f"{ctx}: content mismatch"


def _write(tmp, name: str, t: pa.Table) -> str:
    import pyarrow.parquet as pq
    p = str(tmp / f"{name}.parquet")
    pq.write_table(t, p)
    return p


def _apply_pred(t: pa.Table, pred: tuple, keep_matching: bool) -> pa.Table:
    col, op, val = pred
    fn = {"==": pc.equal, "!=": pc.not_equal, ">": pc.greater,
          ">=": pc.greater_equal, "<": pc.less, "<=": pc.less_equal}[op]
    m = fn(t[col], val)
    return t.filter(m if keep_matching else pc.invert(m))


def _mutate(rows: pa.Table) -> pa.Table:
    """A CDC delta: same doc_ids, visibly different payload."""
    return pa.table({
        "doc_id": rows["doc_id"],
        "tokens": pc.list_slice(rows["tokens"], 0, 5),
        "n_tok": pc.cast(pc.add(rows["n_tok"], 1000), pa.int32()),
        "source": rows["source"],
    })


@pytest.mark.parametrize("seed,backend", [(3, "local"), (17, "local"),
                                          (29, "local"), (17, "mem"),
                                          (29, "pfs")])
def test_random_lifecycle_sequence(ray_session, tmp_path, seed, backend):
    rng = np.random.default_rng(seed)
    # the mem:// variant drives the same random sequence through the
    # non-path-mappable handler backend (named-actor store, no rename)
    store = {"local": str(tmp_path / "store"),
             "mem": f"mem://rl{seed}/store",
             "pfs": f"pfs://{tmp_path}/store"}[backend]

    cursor = 1200  # next unused master row (append slices are disjoint)
    mirror = MASTER.slice(0, cursor)
    encode_dataset(_write(tmp_path, "init", mirror), store,
                   mode="cluster", target_rows=400)
    _assert_equal(store, mirror, "initial encode")

    # (snapshot_id, mirror copy, index into oplog) checkpoints + the
    # erasure log that later pierces them
    checkpoints: list[tuple[int, pa.Table, int]] = []
    erasures: list[tuple[str, object]] = []  # ("pred", t) | ("keys", set)

    ops = rng.choice(["append", "upsert", "delete", "compact",
                      "recluster", "purge", "vacuum"], size=8,
                     p=[.22, .22, .2, .1, .1, .08, .08])
    for i, op in enumerate(ops):
        if op == "append" and cursor + 400 <= MASTER.num_rows:
            d = MASTER.slice(cursor, 400)
            cursor += 400
            append_to_store(store, _write(tmp_path, f"ap{i}", d),
                            mode="cluster", target_rows=300)
            mirror = pa.concat_tables([mirror, d])
        elif op == "upsert" and mirror.num_rows:
            take = rng.choice(mirror.num_rows,
                              size=min(150, mirror.num_rows),
                              replace=False)
            delta = _mutate(mirror.take(pa.array(np.sort(take))))
            upsert_to_store(store, _write(tmp_path, f"up{i}", delta),
                            key="doc_id", target_rows=300)
            keys = set(delta["doc_id"].to_pylist())
            mask = pc.is_in(mirror["doc_id"],
                            value_set=pa.array(sorted(keys)))
            mirror = pa.concat_tables(
                [mirror.filter(pc.invert(mask)),
                 delta.cast(mirror.schema)])
            erasures.append(("keys", keys))
        elif op == "delete":
            pred = [("source", "==", "web"),
                    ("n_tok", ">", int(rng.integers(800, 3000))),
                    ("n_tok", "<", int(rng.integers(20, 120)))][
                        int(rng.integers(0, 3))]
            delete_where(store, pred)
            mirror = _apply_pred(mirror, pred, keep_matching=False)
            erasures.append(("pred", pred))
        elif op == "compact":
            compact_store(store, target_rows=800)
        elif op == "recluster":
            recluster_store(store, "doc_id")
        elif op == "purge":
            purge_deletes(store)
        else:
            vacuum_store(store)
        _assert_equal(store, mirror, f"step {i}:{op}")
        checkpoints.append((int(load_footer(store)["snapshot_id"]),
                            mirror, len(erasures)))

    # time travel with erasure semantics: every still-retained snapshot
    # replays its historical mirror minus later deletes/upsert keys
    verified = 0
    for sid, hist, n_seen in checkpoints:
        try:
            load_footer(store, as_of=sid)
        except FileNotFoundError:
            continue  # expired by maintenance — documented semantics
        m = hist
        for kind, x in erasures[n_seen:]:
            if kind == "pred":
                m = _apply_pred(m, x, keep_matching=False)
            else:
                mask = pc.is_in(m["doc_id"], value_set=pa.array(sorted(x)))
                m = m.filter(pc.invert(mask))
        _assert_equal(store, m, f"as_of {sid}", as_of=sid)
        verified += 1
    assert verified >= 1
