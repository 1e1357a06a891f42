"""Footer index + per-partition lineage manifest (checkpoint / resume).

Generalizes the reference's skip-if-done resume during database builds
("Parquet folder already exists → skip", howard/functions/databases.py:2112-2114,
2221-2224) into an explicit per-block lineage record, as the north_star
requires: every partition emits {input file, row range, codec ids, checksum}
to ``manifest.jsonl``; a killed job resumes by diffing the manifest against
block files actually present on disk.

Layout of an encoded store directory:

    <store>/
      blocks/<block_id>.hrb      # encoded blocks (atomic tmp+rename writes)
      manifest.jsonl             # one lineage record per completed block
      footer.json                # ordered global index (written at finalize)
"""

from __future__ import annotations

import json
import os
from typing import Iterable


def store_paths(store_dir: str) -> tuple[str, str, str]:
    return (os.path.join(store_dir, "blocks"),
            os.path.join(store_dir, "manifest.jsonl"),
            os.path.join(store_dir, "footer.json"))


def init_store(store_dir: str) -> None:
    blocks, _, _ = store_paths(store_dir)
    os.makedirs(blocks, exist_ok=True)


def block_path(store_dir: str, block_id: str) -> str:
    return os.path.join(store_dir, "blocks", f"{block_id}.hrb")


def append_lineage(store_dir: str, record: dict) -> None:
    """Append one lineage record; O_APPEND single-line writes are atomic
    enough for line-granular recovery (torn trailing lines are dropped on
    load)."""
    _, manifest, _ = store_paths(store_dir)
    line = json.dumps(record, separators=(",", ":")) + "\n"
    with open(manifest, "a") as f:
        f.write(line)


def load_manifest(store_dir: str) -> list[dict]:
    _, manifest, _ = store_paths(store_dir)
    if not os.path.exists(manifest):
        return []
    records = []
    with open(manifest) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                records.append(json.loads(line))
            except json.JSONDecodeError:
                continue  # torn trailing line from a killed writer
    return records


def completed_blocks(store_dir: str, verify: bool = False) -> dict[str, dict]:
    """block_id -> lineage record, for records whose block file exists with
    the recorded size (the resume diff). ``verify=True`` additionally
    re-checksums every block file against its lineage crc32 — full-scan
    paranoia for audits; the default size check is the cheap path a resumed
    100-TB job runs (atomic tmp+rename writes mean a file of the right size
    is a completed write, and per-column crc32s are still verified at every
    decode)."""
    import zlib

    done: dict[str, dict] = {}
    for rec in load_manifest(store_dir):
        path = block_path(store_dir, rec["block_id"])
        try:
            if os.path.getsize(path) != rec["encoded_bytes"]:
                continue
            if verify and "crc32" in rec:
                with open(path, "rb") as f:
                    if zlib.crc32(f.read()) != rec["crc32"]:
                        continue
            done[rec["block_id"]] = rec
        except OSError:
            continue
    return done


def write_footer(store_dir: str, records: Iterable[dict], extra: dict | None = None) -> dict:
    """Write the ordered global footer index: blocks sorted by
    (sort_key, block_id) with offsets-free per-block stats — the engine's
    zone map (analog of the reference's .hdr sidecar + tabix index,
    howard/objects/variants.py:2351-2444, functions/commons.py:2403-2411)."""
    recs = sorted(records, key=lambda r: (r.get("sort_key", ""), r["block_id"]))
    footer = {
        "version": 1,
        "n_blocks": len(recs),
        "n_rows": sum(r["n_rows"] for r in recs),
        "encoded_bytes": sum(r["encoded_bytes"] for r in recs),
        "blocks": recs,
    }
    if extra:
        footer.update(extra)
    _, _, footer_path = store_paths(store_dir)
    tmp = footer_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(footer, f, separators=(",", ":"))
    os.replace(tmp, footer_path)
    return footer


def load_footer(store_dir: str) -> dict:
    _, _, footer_path = store_paths(store_dir)
    with open(footer_path) as f:
        return json.load(f)
