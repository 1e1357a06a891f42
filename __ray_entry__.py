"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (salted-shuffle columnar encode →
decode → bit-identical verify) on a deterministic sf0.001-scale tokens
corpus (BASELINE.json input_hint schema) and returns per-block metrics.
``queries()``/``oracle_sql()`` export the operator library (SURVEY.md §2)
for the driver's DuckDB correctness gate at sf0.01.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable
from typing import Any

_ENGINE_ROWS = {"sf0.001": 2_000, "sf0.01": 6_000, "sf0.1": 60_000}


def _corpus_rows_for(sf_dir: str) -> int:
    base = os.path.basename(os.path.normpath(sf_dir))
    return _ENGINE_ROWS.get(base, 2_000)


def _run_encode_pipeline(n_rows: int, mode: str = "cluster"):
    """Synthesize (cached) corpus → encode → footer metrics table."""
    import pandas as pd

    from howard_ray.fixtures import corpus_path, write_corpus
    from howard_ray.pipeline import encode_dataset

    tmp_root = os.path.join(tempfile.gettempdir(), "howard_ray_cache")
    os.makedirs(tmp_root, exist_ok=True)
    src = write_corpus(corpus_path(tmp_root, n_rows), n_rows)
    store = os.path.join(tmp_root, f"store_{mode}_{n_rows}")
    if os.path.exists(store):
        shutil.rmtree(store)
    footer = encode_dataset(src, store, mode=mode, target_rows=10_000)
    rows = [{
        "block_id": b["block_id"],
        "n_rows": b["n_rows"],
        "raw_bytes": b["raw_bytes"],
        "encoded_bytes": b["encoded_bytes"],
        "tokens_codec": b["codecs"].get("tokens", ""),
        "doc_id_codec": b["codecs"].get("doc_id", ""),
        "source_codec": b["codecs"].get("source", ""),
    } for b in footer["blocks"]]
    return pd.DataFrame(rows).sort_values("block_id").reset_index(drop=True), src, store


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale; returns per-block metrics
    (>=1 row, stable schema)."""
    metrics, _, _ = _run_encode_pipeline(_ENGINE_ROWS["sf0.001"])
    return metrics


def _encode_roundtrip_query(sf_dir: str):
    """Engine correctness as a query: encode+decode the deterministic corpus
    for this sf, then aggregate the DECODED data per source — any decode
    corruption changes the aggregate. Rows-only check (corpus is not a
    registered oracle view)."""
    import pandas as pd

    from howard_ray.pipeline import decode_store

    _, _, store = _run_encode_pipeline(_corpus_rows_for(sf_dir))
    ds = decode_store(store, columns=["source", "n_tok", "tokens"])

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def agg(batch: pa.Table) -> pa.Table:
        # group WITHIN the batch by source: Ray's rebatching may coalesce
        # rows from several decoded blocks (different sources) into one batch,
        # so assuming a single-source batch would mislabel the partial sums
        tok_per_row = pc.list_value_length(batch["tokens"])
        flat_sum = pa.table({
            "source": batch["source"],
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "n_tok": pc.cast(batch["n_tok"], pa.int64()),
            "tok_sum": pc.cast(tok_per_row, pa.int64()),
        })
        # per-row token sums: segment-sum the flattened values by row length
        vals = pc.list_flatten(batch["tokens"]).to_numpy(zero_copy_only=False)
        lens = tok_per_row.to_numpy(zero_copy_only=False).astype(np.int64)
        ends = np.cumsum(lens)
        csum = np.concatenate(([0], np.cumsum(vals, dtype=np.int64)))
        row_tok_sums = csum[ends] - csum[ends - lens]
        flat_sum = flat_sum.set_column(
            3, "tok_sum", pa.array(row_tok_sums, type=pa.int64()))
        g = flat_sum.group_by("source").aggregate(
            [("one", "sum"), ("n_tok", "sum"), ("tok_sum", "sum")])
        return pa.table({
            "source": g["source"],
            "n_docs": g["one_sum"],
            "sum_n_tok": g["n_tok_sum"],
            "sum_tokens": g["tok_sum_sum"],
        })

    from ray.data.aggregate import Sum
    out = (ds.map_batches(agg, batch_format="pyarrow")
             .groupby("source")
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("sum_n_tok", alias_name="sum_n_tok"),
                        Sum("sum_tokens", alias_name="sum_tokens"))
             .to_pandas())
    for c in ["n_docs", "sum_n_tok", "sum_tokens"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def _compression_metrics_query(sf_dir: str):
    """Compression ratio vs Parquet+zstd for this sf's corpus (rows-only)."""
    import io

    import pandas as pd
    import pyarrow.parquet as pq

    from howard_ray.pipeline import store_total_bytes

    _, src, store = _run_encode_pipeline(_corpus_rows_for(sf_dir))
    t = pq.read_table(src)
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="zstd")
    ours = store_total_bytes(store)
    theirs = buf.getbuffer().nbytes
    return pd.DataFrame([{
        "n_rows": t.num_rows,
        "raw_bytes": t.nbytes,
        "encoded_bytes": ours,
        "parquet_zstd_bytes": theirs,
        "beats_parquet_zstd": int(ours <= theirs),
    }])


def queries() -> dict[str, Callable[[str], Any]]:
    from howard_ray.ops import all_queries

    q = dict(all_queries())
    q["encode_roundtrip"] = _encode_roundtrip_query
    q["compression_metrics"] = _compression_metrics_query
    return q


def oracle_sql() -> dict[str, str]:
    from howard_ray.ops import all_oracle_sql

    # two SQL twins (media_features, hgvs_context) read /tmp fixture parquet
    # files; materialize them NOW so DuckDB can evaluate the oracle before —
    # or without — running the corresponding Ray query on a fresh machine
    from howard_ray.ops.hgvs import ensure_tx_models
    from howard_ray.ops.multimodal import ensure_media_fixture
    from howard_ray.ops.vfix import ensure_genome
    ensure_media_fixture()
    ensure_genome()
    ensure_tx_models()
    return dict(all_oracle_sql())
