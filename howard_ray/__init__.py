"""howard_ray — a Ray-Data-native per-column lightweight-compression engine.

Built from scratch (NOT a port) with the query / data-processing
capabilities of the reference engine HOWARD
(bioinfo-chru-strasbourg/howard, snapshot at /root/reference).

The reference is a single-node DuckDB-SQL variant-processing engine whose
"databases" tool builds chunked, hive-partitioned, row-group-sized Parquet
annotation stores (reference: howard/functions/databases.py:2199-2213).
This package re-expresses that columnar-store behavior Ray-Data-first:

- ``codecs``   — pure-NumPy lightweight compression kernels
                 (frame-of-reference + bit-pack, RLE, delta, dictionary,
                 FSST-style string symbol tables, zstd fallback);
- ``selector`` — sampling-based per-block codec auto-selection
                 (the reference's "sample to decide, then full pass" idiom,
                 howard/objects/database.py:1361);
- ``block``    — encoded block file format with per-column codec ids,
                 min/max zone maps and checksums (the analog of the
                 reference's ``.hdr`` sidecar, howard/objects/variants.py:2351);
- ``manifest`` — footer index + per-partition lineage records enabling
                 skip-if-done resume (reference: functions/databases.py:2112);
- ``pipeline`` — the ray.data.Dataset encode/decode pipelines
                 (read_parquet → map_batches over zero-copy Arrow →
                 salted groupby('source') → ordered block write);
- ``ops``      — the general operator library (aggregates, joins, dedup,
                 text analysis, similarity search, windows) mirroring the
                 reference's operator inventory (SURVEY.md §2).
"""

__version__ = "0.1.0"

# ---------------------------------------------------------------------------
# Targeted noise filters (round-3 verdict item #9): two Ray Data warnings
# are structural on this workload and drown real ones in the bench tail —
# (a) "Failed to hash the schemas" fires because the testdata parquet
# carries a pandas-metadata dict (unhashable) in the Arrow schema, and
# (b) the sort operator emits schema-less EMPTY filler blocks for empty
# partitions, tripping the RefBundle schema-change check. Filter exactly
# those two messages; every other warning from the same loggers passes.
# ---------------------------------------------------------------------------
import logging as _logging


class _RayNoiseFilter(_logging.Filter):
    _NEEDLES = ("Failed to hash the schemas",
                "RefBundle with a different schema")

    def filter(self, record: "_logging.LogRecord") -> bool:
        try:
            msg = record.getMessage()
        except Exception:
            return True
        return not any(n in msg for n in self._NEEDLES)


for _name in ("ray.data._internal.arrow_ops.transform_pyarrow",
              "ray.data._internal.execution.streaming_executor_state"):
    _logging.getLogger(_name).addFilter(_RayNoiseFilter())
