"""External-tool actor stage — the reference's shell-out pattern
(SURVEY.md §2.10) made real on Ray Data.

The reference shards work and pipes each shard through an external binary
— bcftools/snpEff for annotation, and [p/b]gzip for parallel compression
(howard/functions/commons.py:2274-2415: chunk the body, gzip each chunk in
a thread pool, concatenate). The Ray-native shape is an ACTOR-POOL
``map_batches`` stage: tool presence/version is probed once per actor in
``__init__`` (the expensive step for a real tool: env/index/jar load),
each ``__call__`` streams one batch through the tool via stdin/stdout
pipes, and the output is an ordinary Arrow batch that flows on through the
Dataset — no driver round-trip, no temp-file fan-in.

The demo tool is ``gzip`` (the one external binary the sandbox guarantees,
and literally the reference's compression shell-out): each fixed-size
document chunk is compressed by one subprocess; the tiny per-chunk stat
rows are then merged into one total — chunked parallel compression with a
deterministic result (fixed batch_size + deterministic scan order).
gzip output bytes are tool-version dependent → rows-only check + pytest.
"""

from __future__ import annotations

import subprocess

import pandas as pd

from .util import tbl

SQL: dict[str, str] = {}

CHUNK_DOCS = 200  # fixed chunk size => deterministic chunk boundaries


class GzipChunk:
    """One external `gzip -c -6` subprocess per batch (= chunk), the
    reference's concat_and_compress_files unit of work."""

    def __init__(self):
        out = subprocess.run(["gzip", "--version"], capture_output=True,
                             text=True, check=True)
        self.version = out.stdout.splitlines()[0]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        data = "\n".join(batch["text"].to_numpy()).encode("utf-8")
        gz = subprocess.run(["gzip", "-c", "-6"], input=data,
                            capture_output=True, check=True).stdout
        return pd.DataFrame({"n_docs": [len(batch)],
                             "raw_bytes": [len(data)],
                             "gz_bytes": [len(gz)]})


def external_gzip_compress(sf_dir: str):
    """Chunked parallel compression through the external gzip binary:
    actor-pool stage, one subprocess per chunk, per-chunk stats merged to
    one deterministic total row (+ overall ratio)."""
    parts = (tbl(sf_dir, "documents", ["text"])
             .map_batches(GzipChunk, batch_format="pandas",
                          batch_size=CHUNK_DOCS, concurrency=(1, 4))
             .to_pandas())
    total = parts.sum()
    return pd.DataFrame({
        "n_chunks": [len(parts)],
        "n_docs": [int(total["n_docs"])],
        "raw_bytes": [int(total["raw_bytes"])],
        "gz_bytes": [int(total["gz_bytes"])],
        "ratio": [round(float(total["gz_bytes"]) / max(1, int(total["raw_bytes"])), 4)],
    })
