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
