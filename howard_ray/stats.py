"""Metrics / overview reports — the reference's stats tool
(get_stats howard/objects/variants.py:570-790, stats_to_file :792-813,
tools/stats.py) re-targeted at encoded stores: rows, bytes in/out,
per-codec block counts, compression ratio, per-source distribution.
Per-partition metrics come from the lineage manifest; the report is their
merge (partial+final, no full-data pass)."""

from __future__ import annotations

from collections import Counter

from .manifest import load_footer


def store_report(store_dir: str) -> dict:
    footer = load_footer(store_dir)
    blocks = footer["blocks"]
    codec_counts: Counter = Counter()
    per_source: dict[str, dict] = {}
    for b in blocks:
        for col, codec in b.get("codecs", {}).items():
            codec_counts[f"{col}:{codec}"] += 1
        # source attribution from the LINEAGE input tag, not the block id:
        # cluster ids are '<source>-<salt>-<seq>' but stream ids are content
        # hashes and compacted ids are digests — parsing those as sources
        # would emit one degenerate "source" per slab/digest
        inp = b.get("input", "")
        if inp.startswith(("cluster:", "cluster-exchange:")):
            src = inp.split(":", 2)[1]
        elif inp.startswith("stream:"):
            src = "(stream)"
        elif inp.startswith("compact:"):
            src = "(compacted)"
        else:
            src = b["block_id"].rsplit("-", 2)[0]
        s = per_source.setdefault(src, {"blocks": 0, "rows": 0,
                                        "raw_bytes": 0, "encoded_bytes": 0})
        s["blocks"] += 1
        s["rows"] += b["n_rows"]
        s["raw_bytes"] += b.get("raw_bytes", 0)
        s["encoded_bytes"] += b["encoded_bytes"]
    raw = sum(b.get("raw_bytes", 0) for b in blocks)
    enc = footer["encoded_bytes"]
    return {
        "n_blocks": footer["n_blocks"],
        "n_rows": footer["n_rows"],
        "raw_bytes": raw,
        "encoded_bytes": enc,
        "compression_ratio": round(raw / enc, 4) if enc else None,
        "mode": footer.get("mode"),
        "wall_sec": footer.get("wall_sec"),
        "throughput_gbps": footer.get("throughput_gbps"),
        "codec_blocks": dict(sorted(codec_counts.items())),
        "per_source": dict(sorted(per_source.items())),
        # O(metadata) token total from the zone-map sums (None on stores
        # written before sum-bearing stats)
        "sum_n_tok_meta": _meta_sum(blocks, "n_tok"),
        # pending row-level deletes (tombstoned, not yet purged/compacted):
        # footer n_rows counts these until purge_deletes reclaims them
        "tombstoned_rows": _tombstoned_rows(store_dir),
        # clustering health per declared cluster key: 'disorder' = fraction
        # of blocks whose key range STRICTLY overlaps another's — the exact
        # set `recluster --incremental` would rewrite; 0.0 means every
        # range/point predicate on the key prunes maximally
        "clustering": _clustering_health(footer, blocks),
    }


def _clustering_health(footer: dict, blocks: list[dict]):
    cb = footer.get("clustered_by")
    if not cb:
        return None
    keys = (cb.get("zorder") if isinstance(cb, dict) else
            ([cb] if isinstance(cb, str) else list(cb)))
    out = []
    for key in keys:
        st = [((b.get("columns") or {}).get(key) or {}).get("stats") or {}
              for b in blocks]
        if any("min" not in x or "max" not in x for x in st):
            out.append({"key": key, "disorder": None})
            continue
        ivs = sorted((x["min"], x["max"]) for x in st)
        comps, overl, cur_hi, size = 0, 0, None, 0
        for lo, hi in ivs:
            if cur_hi is not None and lo < cur_hi:
                size += 1
                cur_hi = max(cur_hi, hi)
            else:
                overl += size if size > 1 else 0
                comps += 1
                size = 1
                cur_hi = hi
        overl += size if size > 1 else 0
        out.append({"key": key, "components": comps,
                    "overlapping_blocks": overl,
                    "disorder": round(overl / len(ivs), 4) if ivs else 0.0})
    return out


def _tombstoned_rows(store_dir: str) -> int:
    from .manifest import list_tombstones, load_tombstone

    total = 0
    for bid in list_tombstones(store_dir):
        idx = load_tombstone(store_dir, bid)
        total += 0 if idx is None else len(idx)
    return total


def _meta_sum(blocks: list[dict], column: str):
    total = 0
    for b in blocks:
        st = (b.get("columns", {}).get(column) or {}).get("stats", {})
        if "sum" not in st:
            return None
        total += int(st["sum"])
    return total


def metadata_aggregate(store_dir: str, column: str) -> dict:
    """O(metadata) SUM/COUNT of an integer (or list<int>) column straight
    from the footer zone maps — no block is read or decoded. The Parquet
    column-statistics idea applied to the encoded store: a 100-TB store
    answers `SUM(n_tok)` from its footer alone. Returns
    {"n_rows", "sum", "n_blocks", "complete"}; `complete` is False when any
    block predates the sum-bearing stats (then the caller must decode)."""
    footer = load_footer(store_dir)
    total = 0
    rows = 0
    complete = True
    for b in footer["blocks"]:
        st = (b.get("columns", {}).get(column) or {}).get("stats", {})
        if "sum" not in st:
            complete = False
        else:
            total += int(st["sum"])
        rows += b["n_rows"]
    return {"n_rows": rows, "sum": total if complete else None,
            "n_blocks": footer["n_blocks"], "complete": complete}
