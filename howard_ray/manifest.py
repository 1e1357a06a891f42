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

from . import storeio as sio


def store_paths(store_dir: str) -> tuple[str, str, str]:
    return (os.path.join(store_dir, "blocks"),
            os.path.join(store_dir, "manifest.jsonl"),
            os.path.join(store_dir, "footer.json"))


def init_store(store_dir: str) -> None:
    blocks, _, _ = store_paths(store_dir)
    sio.makedirs(blocks, exist_ok=True)


def block_path(store_dir: str, block_id: str) -> str:
    return os.path.join(store_dir, "blocks", f"{block_id}.hrb")


def append_lineage(store_dir: str, record: dict) -> None:
    """Append one lineage record; O_APPEND single-line writes are atomic
    enough for line-granular recovery (torn trailing lines are dropped on
    load)."""
    _, manifest, _ = store_paths(store_dir)
    line = json.dumps(record, separators=(",", ":")) + "\n"
    with sio.sopen(manifest, "a") as f:
        f.write(line)


def load_manifest(store_dir: str) -> list[dict]:
    _, manifest, _ = store_paths(store_dir)
    if not sio.exists(manifest):
        return []
    records = []
    with sio.sopen(manifest) as f:
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
            if sio.getsize(path) != rec["encoded_bytes"]:
                continue
            if verify and "crc32" in rec:
                with sio.sopen(path, "rb") as f:
                    if zlib.crc32(f.read()) != rec["crc32"]:
                        continue
            done[rec["block_id"]] = rec
        except OSError:
            continue
    return done


def _footer_shard_size() -> int:
    """Blocks per footer shard. Above this count the footer index splits
    into shard files with per-shard aggregate zone maps, so a 10^7-block
    store (10^12 rows / 100k-row blocks) never requires the driver to hold
    or parse one multi-GB JSON; a filtered read prunes whole shard files
    before reading a single block record."""
    return int(os.environ.get("HOWARD_FOOTER_SHARD_SIZE", "100000"))


def _shard_zone(recs: list[dict]) -> dict:
    """Per-column aggregate [min, max] over the shard's block zone maps.
    A column missing a zone map in ANY member block is omitted (cannot
    prune the shard on it)."""
    zone: dict = {}
    dead: set = set()
    for r in recs:
        cols = r.get("columns") or {}
        for c in set(zone) | set(cols):
            if c in dead:
                continue
            st = (cols.get(c) or {}).get("stats") or {}
            if st.get("min") is None:
                # missing OR all-null block ({"min": null}): the column
                # cannot prune this shard, and a None must never reach
                # the min()/max() fold below (TypeError)
                dead.add(c)
                zone.pop(c, None)
                continue
            z = zone.get(c)
            if z is None:
                if r is recs[0]:
                    zone[c] = [st["min"], st["max"]]
                else:  # column absent from an earlier block
                    dead.add(c)
                continue
            z[0] = min(z[0], st["min"])
            z[1] = max(z[1], st["max"])
    return zone


def _atomic_json(path: str, obj) -> None:
    """Atomic DURABLE json write: the fsync before the rename matters —
    compaction deletes superseded block files right after the footer swap,
    so an un-synced footer rename that loses a power race against those
    deletes would leave the old footer pointing at unlinked blocks."""
    tmp = path + ".tmp"
    with sio.sopen(tmp, "w") as f:
        json.dump(obj, f, separators=(",", ":"))
        f.flush()
        sio.fsync(f)
    sio.replace(tmp, path)


def write_footer(store_dir: str, records: Iterable[dict], extra: dict | None = None) -> dict:
    """Write the ordered global footer index: blocks sorted by
    (sort_key, block_id) with offsets-free per-block stats — the engine's
    zone map (analog of the reference's .hdr sidecar + tabix index,
    howard/objects/variants.py:2351-2444, functions/commons.py:2403-2411).

    Stores above ``HOWARD_FOOTER_SHARD_SIZE`` blocks write a SHARDED footer:
    ``footer.json`` holds only totals plus a shard index (file name, counts,
    aggregate zone map per shard); block records live in
    ``footer_shards/shard-<gen>-*.json``. Each rewrite uses a FRESH
    generation number in the shard filenames — never overwriting the files
    the live footer references — and the footer swap is the single atomic
    flip; a crash between shard writes and the swap leaves the old footer
    pointing at intact old-generation shards (new-generation orphans are
    garbage-collected on the next successful swap)."""
    recs = sorted(records, key=lambda r: (r.get("sort_key", ""), r["block_id"]))
    # duplicate-id tripwire: two lineage records for one block file means
    # one batch silently overwrote another (bit-identical duplicate input
    # slabs in stream mode, or an id-scheme bug) — fail loudly instead of
    # writing a footer whose row totals cannot decode
    seen: dict[str, int] = {}
    for r in recs:
        seen[r["block_id"]] = seen.get(r["block_id"], 0) + 1
    dups = [k for k, v in seen.items() if v > 1]
    if dups:
        raise ValueError(
            f"duplicate block ids in footer ({dups[:3]}...): distinct "
            "batches collided on one block file; use mode='cluster' for "
            "inputs with bit-identical duplicate batches")
    totals = {
        "n_blocks": len(recs),
        "n_rows": sum(r["n_rows"] for r in recs),
        "encoded_bytes": sum(r["encoded_bytes"] for r in recs),
    }
    _, _, footer_path = store_paths(store_dir)
    shard_size = _footer_shard_size()
    shard_dir = os.path.join(store_dir, "footer_shards")
    # callers carry prior-footer extras forward wholesale; the snapshot
    # counter and timestamp are write_footer's own and must not be echoed
    # strip EVERY structural key here, not just write_footer's own three:
    # callers carry prior-footer extras forward wholesale, and a stale
    # n_rows/blocks/shards overwriting the fresh totals would corrupt the
    # footer silently (callers' own filters become harmless duplication)
    extra = {k: v for k, v in (extra or {}).items()
             if k not in ("snapshot_id", "ts", "nonce", "version",
                          "n_blocks", "n_rows", "encoded_bytes", "blocks",
                          "sharded", "shards")} or None
    snap_id = 1
    try:  # monotone snapshot counter survives every footer rewrite
        with sio.sopen(footer_path) as f:
            snap_id = int(json.load(f).get("snapshot_id", 0)) + 1
    except (OSError, ValueError):
        pass

    def _clean_stale(keep: set) -> None:
        # after the footer swap: shard files referenced by neither the live
        # footer nor a retained snapshot are garbage
        keep = keep | _snapshot_shard_refs(store_dir)
        try:
            for f in sio.listdir(shard_dir):
                if f not in keep and not f.endswith(".tmp"):
                    sio.remove(os.path.join(shard_dir, f))
        except OSError:
            pass

    if len(recs) <= shard_size:
        footer = {"version": 1, "snapshot_id": snap_id, "ts": _now_iso(),
                  "nonce": _footer_nonce(), **totals, "blocks": recs}
        if extra:
            footer.update(extra)
        _atomic_json(footer_path, footer)
        _write_snapshot(store_dir, footer)
        _clean_stale(set())
        return footer
    sio.makedirs(shard_dir, exist_ok=True)
    gen = 0
    try:  # next unused generation: old footer's shards stay untouched
        import re as _re
        for f in sio.listdir(shard_dir):
            m = _re.match(r"shard-(\d+)-", f)
            if m:
                gen = max(gen, int(m.group(1)) + 1)
    except OSError:
        pass
    shards = []
    for i in range(0, len(recs), shard_size):
        chunk = recs[i: i + shard_size]
        fname = f"shard-{gen:06d}-{i // shard_size:06d}.json"
        _atomic_json(os.path.join(shard_dir, fname), chunk)
        shards.append({"file": fname, "n_blocks": len(chunk),
                       "n_rows": sum(r["n_rows"] for r in chunk),
                       "zone": _shard_zone(chunk)})
    footer = {"version": 2, "sharded": True, "snapshot_id": snap_id,
              "ts": _now_iso(), "nonce": _footer_nonce(), **totals,
              "shards": shards}
    if extra:
        footer.update(extra)
    _atomic_json(footer_path, footer)
    _write_snapshot(store_dir, footer)
    _clean_stale({sh["file"] for sh in shards})
    return footer


# ---------------------------------------------------------------------------
# Snapshots (time travel)
#
# Every footer swap archives the new footer under snapshots/footer-<id>.json
# with a monotone snapshot_id — the Iceberg snapshot idea at footer
# granularity. A snapshot is pure METADATA (for sharded footers it holds the
# shard index; shard files it references are protected from shard GC), so
# additive operations (append, derive) keep every older snapshot readable:
# block files are immutable and never touched. Destructive maintenance
# (compact, purge) physically removes superseded block files and must call
# :func:`expire_snapshots` with the removed ids — snapshots that reference
# any of them are dropped eagerly instead of failing lazily at decode.
#
# Row-level DELETES intentionally pierce time travel: tombstones are keyed
# by block_id and applied at decode regardless of ``as_of`` — an erasure
# (GDPR) delete must not remain readable through an older snapshot. This is
# a deliberate divergence from Iceberg's snapshot-scoped delete files.


def snapshot_path(store_dir: str, snapshot_id: int) -> str:
    return os.path.join(store_dir, "snapshots",
                        f"footer-{snapshot_id:08d}.json")


def _snapshot_retain() -> int:
    """Min 1: the live footer's own snapshot must survive (shard GC and
    time travel anchor on it), and ids[:-0] is the empty slice — a 0/
    negative setting would silently retain EVERYTHING instead of less."""
    return max(1, int(os.environ.get("HOWARD_SNAPSHOT_RETAIN", "16")))


def _now_iso() -> str:
    import time
    return time.strftime("%Y-%m-%dT%H:%M:%S")


def _footer_nonce() -> str:
    """Per-footer random discriminator: the _SHARD_CACHE key must never
    alias two footer states, and (snapshot_id, ts, shard filenames) CAN
    collide when a store is deleted and re-encoded at the same path
    within one second (generation numbering restarts with the empty
    footer_shards/ dir) — ADVICE r4 #2."""
    import uuid
    return uuid.uuid4().hex


def _write_snapshot(store_dir: str, footer: dict) -> None:
    snap_dir = os.path.join(store_dir, "snapshots")
    sio.makedirs(snap_dir, exist_ok=True)
    _atomic_json(snapshot_path(store_dir, footer["snapshot_id"]), footer)
    keep = _snapshot_retain()
    ids = sorted(list_snapshot_ids(store_dir))
    for sid in ids[:-keep] if len(ids) > keep else []:
        try:
            sio.remove(snapshot_path(store_dir, sid))
        except OSError:
            pass


def list_snapshot_ids(store_dir: str) -> list[int]:
    snap_dir = os.path.join(store_dir, "snapshots")
    out = []
    try:
        for f in sio.listdir(snap_dir):
            if f.startswith("footer-") and f.endswith(".json"):
                try:
                    out.append(int(f[len("footer-"):-len(".json")]))
                except ValueError:
                    continue
    except OSError:
        pass
    return sorted(out)


def list_snapshots(store_dir: str) -> list[dict]:
    """One summary row per retained snapshot (id, ts, totals)."""
    rows = []
    for sid in list_snapshot_ids(store_dir):
        try:
            with sio.sopen(snapshot_path(store_dir, sid)) as f:
                s = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        rows.append({"snapshot_id": sid, "ts": s.get("ts"),
                     "n_blocks": s["n_blocks"], "n_rows": s["n_rows"],
                     "encoded_bytes": s["encoded_bytes"]})
    return rows


def _snapshot_shard_refs(store_dir: str) -> set:
    """Footer-shard files referenced by any retained snapshot (protected
    from shard GC). Bounded by the retention count."""
    refs: set = set()
    for sid in list_snapshot_ids(store_dir):
        try:
            with sio.sopen(snapshot_path(store_dir, sid)) as f:
                s = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for sh in s.get("shards") or []:
            refs.add(sh["file"])
    return refs


def expire_snapshots(store_dir: str, removed_block_ids: set) -> int:
    """Drop snapshots that reference any physically removed block — called
    by destructive maintenance (compact / purge) right after its footer
    swap. Returns the number of snapshots expired. The LIVE footer's own
    snapshot is never expired (it references only surviving files)."""
    if not removed_block_ids:
        return 0
    removed = set(removed_block_ids)
    live_sid = None
    try:
        _, _, footer_path = store_paths(store_dir)
        with sio.sopen(footer_path) as f:
            live_sid = json.load(f).get("snapshot_id")
    except (OSError, ValueError):
        pass
    n = 0
    for sid in list_snapshot_ids(store_dir):
        if sid == live_sid:
            continue
        try:
            with sio.sopen(snapshot_path(store_dir, sid)) as f:
                s = json.load(f)
            if s.get("sharded"):
                blocks = []
                shard_dir = os.path.join(store_dir, "footer_shards")
                for sh in s["shards"]:
                    with sio.sopen(os.path.join(shard_dir, sh["file"])) as g:
                        blocks.extend(json.load(g))
            else:
                blocks = s["blocks"]
            dead = any(b["block_id"] in removed for b in blocks)
        except (OSError, json.JSONDecodeError, KeyError):
            dead = True  # unreadable snapshot is already expired
        if dead:
            try:
                sio.remove(snapshot_path(store_dir, sid))
                n += 1
            except OSError:
                pass
    return n


# Parsed-shard cache for SHARDED footers: keyed by the footer's random
# nonce + shard file-name tuple, so a key can never alias two footer
# states even across delete-and-re-encode at the same path. Bounded
# FIFO. The cached record dicts are shared with callers; the one
# in-place mutator (alter_store) clears the cache before mutating.
_SHARD_CACHE: dict[tuple, list] = {}
_SHARD_CACHE_MAX = 4


_ONE_SHARD_CACHE: dict = {}
_ONE_SHARD_CACHE_MAX = 256


def footer_cache_clear() -> None:
    _SHARD_CACHE.clear()
    _ONE_SHARD_CACHE.clear()


def _cached_one_shard(store_dir: str, nonce, fname: str) -> list:
    """Per-shard parse cache for the FILTERED read path (the zone-pruned
    scale path parses only surviving shards — but repeated point queries
    must not re-download and re-parse the same surviving shard every
    call). Same nonce aliasing guard as the full-footer cache."""
    key = (store_dir, nonce, fname)
    hit = _ONE_SHARD_CACHE.get(hash(key))
    if hit is not None and hit[0] == key:
        return hit[1]
    with sio.sopen(os.path.join(store_dir, "footer_shards", fname)) as f:
        blocks = json.load(f)
    while len(_ONE_SHARD_CACHE) >= _ONE_SHARD_CACHE_MAX:
        _ONE_SHARD_CACHE.pop(next(iter(_ONE_SHARD_CACHE)))
    _ONE_SHARD_CACHE[hash(key)] = (key, blocks)
    return blocks


def _cached_shard_blocks(store_dir: str, footer: dict) -> list:
    # nonce (random per footer write) is the aliasing guard: snapshot_id,
    # ts AND shard filenames all restart when a store is re-encoded at
    # the same path (ADVICE r4 #2). Pre-nonce footers fall back to
    # (snapshot_id, ts) — strictly better than the old filename-only key.
    key = (store_dir,
           footer.get("nonce") or (footer.get("snapshot_id"),
                                   footer.get("ts")),
           tuple(sh["file"] for sh in footer["shards"]))
    hit = _SHARD_CACHE.get(key)
    if hit is not None:
        return hit
    blocks: list = []
    shard_dir = os.path.join(store_dir, "footer_shards")
    for sh in footer["shards"]:
        with sio.sopen(os.path.join(shard_dir, sh["file"])) as f:
            blocks.extend(json.load(f))
    while len(_SHARD_CACHE) >= _SHARD_CACHE_MAX:
        _SHARD_CACHE.pop(next(iter(_SHARD_CACHE)))
    _SHARD_CACHE[key] = blocks
    return blocks


def load_footer(store_dir: str, as_of: int | None = None) -> dict:
    """Full footer with ``blocks`` inflated (sharded footers load every
    shard, memoized per generation — the scale path for filtered reads is
    ``load_blocks``, which prunes shards before reading them).

    ``as_of``: read the archived snapshot footer instead of the live one
    (time travel; raises ``FileNotFoundError`` for an expired/unknown id)."""
    if as_of is not None:
        path = snapshot_path(store_dir, as_of)
        if not sio.exists(path):
            raise FileNotFoundError(
                f"snapshot {as_of} not found in {store_dir} (expired by "
                f"maintenance or never written); retained: "
                f"{list_snapshot_ids(store_dir)}")
    else:
        _, _, path = store_paths(store_dir)
    with sio.sopen(path) as f:
        footer = json.load(f)
    if footer.get("sharded"):
        footer["blocks"] = _cached_shard_blocks(store_dir, footer)
    return footer


def _zone_survives(stats_of, zones: dict) -> bool:
    """stats_of: col -> {"min":..,"max":..} or None when unavailable."""
    for col, (lo, hi) in zones.items():
        st = stats_of(col)
        if not st or st.get("min") is None:
            continue  # no/all-null zone map → cannot prune
        if hi is not None and st["min"] > hi:
            return False
        if lo is not None and st["max"] < lo:
            return False
    return True


def load_blocks(store_dir: str, zones: dict | None = None,
                footer: dict | None = None,
                as_of: int | None = None) -> list[dict]:
    """Block records surviving the ``zones`` filter
    (col -> (lo, hi), either bound None = open). For sharded footers,
    shards whose aggregate zone map misses the filter are never read —
    the driver touches O(surviving blocks), not O(all blocks).
    ``as_of`` reads the archived snapshot footer (time travel)."""
    if footer is None:
        if as_of is not None:
            path = snapshot_path(store_dir, as_of)
            if not sio.exists(path):
                raise FileNotFoundError(
                    f"snapshot {as_of} not found in {store_dir}; retained: "
                    f"{list_snapshot_ids(store_dir)}")
        else:
            _, _, path = store_paths(store_dir)
        with sio.sopen(path) as f:
            footer = json.load(f)
    zones = zones or {}
    if footer.get("sharded"):
        if not zones:
            return list(_cached_shard_blocks(store_dir, footer))
        blocks: list[dict] = []
        nonce = footer.get("nonce") or (footer.get("snapshot_id"),
                                        footer.get("ts"))
        for sh in footer["shards"]:
            zone = sh.get("zone") or {}
            if zones and not _zone_survives(
                    lambda c: ({"min": zone[c][0], "max": zone[c][1]}
                               if c in zone else None), zones):
                continue
            blocks.extend(_cached_one_shard(store_dir, nonce, sh["file"]))
    else:
        blocks = footer["blocks"]
    if zones:
        blocks = [b for b in blocks if _zone_survives(
            lambda c, _b=b: ((_b.get("columns") or {}).get(c) or {}).get("stats"),
            zones)]
    return blocks


# ---------------------------------------------------------------------------
# Row-level delete tombstones
#
# A tombstone is a per-block sorted uint32 row-index list stored NEXT TO the
# immutable block file (blocks are never rewritten by a delete — the GDPR /
# curation-delete shape at 10^12-row scale: a delete touches only the blocks
# whose zone maps admit the predicate, writes O(deleted rows) bytes, and the
# data disappears from every subsequent decode; ``purge_deletes`` later
# rewrites affected blocks to reclaim bytes). Format: magic + uint64 count +
# uint32[] + crc32 trailer; atomic tmp+rename like block files.

_TOMB_MAGIC = b"HRT1"


def tombstone_path(store_dir: str, block_id: str) -> str:
    return os.path.join(store_dir, "tombstones", f"{block_id}.tmb")


def write_tombstone(store_dir: str, block_id: str, indices) -> None:
    """Persist the FULL deleted-row-index set for a block (callers union
    new deletions with the existing tombstone before writing)."""
    import zlib

    import numpy as np

    idx = np.asarray(sorted(set(int(i) for i in indices)), dtype=np.uint32)
    path = tombstone_path(store_dir, block_id)
    sio.makedirs(os.path.dirname(path), exist_ok=True)
    body = idx.tobytes()
    payload = (_TOMB_MAGIC + len(idx).to_bytes(8, "little") + body
               + zlib.crc32(body).to_bytes(4, "little"))
    tmp = path + ".tmp"
    with sio.sopen(tmp, "wb") as f:
        f.write(payload)
        f.flush()
        sio.fsync(f)
    sio.replace(tmp, path)


def load_tombstone(store_dir: str, block_id: str):
    """Sorted uint32 deleted-row indices for a block, or None. A torn or
    corrupt tombstone raises — silently decoding deleted rows back to life
    would be a correctness bug, not a recovery."""
    import zlib

    import numpy as np

    path = tombstone_path(store_dir, block_id)
    try:
        with sio.sopen(path, "rb") as f:
            data = f.read()
    except FileNotFoundError:
        return None
    if data[:4] != _TOMB_MAGIC:
        raise ValueError(f"bad tombstone magic: {path}")
    n = int.from_bytes(data[4:12], "little")
    body = data[12:12 + 4 * n]
    if len(body) != 4 * n or zlib.crc32(body) != int.from_bytes(
            data[12 + 4 * n:16 + 4 * n], "little"):
        raise ValueError(f"corrupt tombstone: {path}")
    return np.frombuffer(body, dtype=np.uint32)


def list_tombstones(store_dir: str) -> dict:
    """block_id -> tombstone path for every tombstone present."""
    d = os.path.join(store_dir, "tombstones")
    try:
        return {f[:-4]: os.path.join(d, f) for f in sio.listdir(d)
                if f.endswith(".tmb")}
    except OSError:
        return {}
