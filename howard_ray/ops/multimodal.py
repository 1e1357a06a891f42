"""Multimodal columns: opaque binary payloads with typed metadata.

The engine treats image/audio/video as ``binary`` columns plus metadata
columns, processed by actor-pool ``map_batches`` stages. The actual
image/audio decoders are NOT available in this environment, so the decode
kernel is a clearly-marked deterministic stub (`FakeImageDecoder`) behind
the same interface a real decoder (PIL/libsndfile/ffmpeg) would use — the
Ray-side plumbing (schema, byte-aware batch sizing, actor signature, output
layout) is real and tested.

Reference analog: the external-tool stages (shard → subprocess → merge,
SURVEY.md §2.10) and the BigWig stateful annotator holding a binary-format
handle per actor (howard/objects/variants.py:3266-3619).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

SQL: dict[str, str] = {}

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("payload", pa.binary()),       # opaque encoded bytes (e.g. JPEG)
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


def make_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus: payload = seeded pseudo-JPEG bytes
    whose first 8 bytes encode (width, height) so the stub decoder can
    produce a deterministic 'decoded' result from payload alone."""
    rng = np.random.default_rng(seed)
    widths = rng.integers(32, 512, n).astype(np.int32)
    heights = rng.integers(32, 512, n).astype(np.int32)
    sizes = rng.integers(200, 4000, n)
    payloads = []
    for i in range(n):
        head = int(widths[i]).to_bytes(4, "little") + int(heights[i]).to_bytes(4, "little")
        body = rng.integers(0, 256, int(sizes[i]), dtype=np.uint8).tobytes()
        payloads.append(head + body)
    return pa.table({
        "media_id": pa.array([f"img-{i:08d}" for i in range(n)]),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(["image/fake"] * n),
        "width": pa.array(widths),
        "height": pa.array(heights),
    })


class FakeImageDecoder:
    """STUB decoder (real decode would call PIL.Image.open and raise
    NotImplementedError here without it). Deterministic: 'decodes' the
    payload into summary features derived only from the bytes, mimicking a
    decode → feature-extract stage. Holds its (fake) codec state per actor."""

    def __init__(self, thumbnail: int = 8):
        self.thumbnail = thumbnail  # a real decoder would init codecs here

    def decode_features(self, payload: bytes) -> tuple[int, int, float, int]:
        w = int.from_bytes(payload[:4], "little")
        h = int.from_bytes(payload[4:8], "little")
        body = np.frombuffer(payload, dtype=np.uint8, offset=8)
        mean = float(body.mean()) if body.size else 0.0
        return w, h, mean, body.size

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.decode_features(p.as_py()) for p in batch["payload"]]
        w, h, mean, nbytes = zip(*feats) if feats else ((), (), (), ())
        return pa.table({
            "media_id": batch["media_id"],
            "width": pa.array(w, type=pa.int32()),
            "height": pa.array(h, type=pa.int32()),
            "mean_byte": pa.array([round(m, 4) for m in mean], type=pa.float64()),
            "decoded_bytes": pa.array(nbytes, type=pa.int64()),
            "aspect_gt_1": pa.array([int(a > b) for a, b in zip(w, h)],
                                    type=pa.int64()),
        })


def media_pipeline(ds: ray.data.Dataset, concurrency=(1, 4),
                   batch_size: int = 256) -> ray.data.Dataset:
    """Decode/feature-extract stage: actor pool, SMALL batches (binary
    payloads are wide — byte-aware batch sizing, SURVEY.md §7.4)."""
    return ds.map_batches(FakeImageDecoder, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


def ensure_media_fixture() -> str:
    """Materialize the deterministic media corpus once; both the Ray query
    and the DuckDB oracle read this same parquet file."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    cache = os.path.join(tempfile.gettempdir(), "howard_ray_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, "media.parquet")
    if not os.path.exists(path):
        pq.write_table(make_media_table(2000), path + ".tmp")
        os.replace(path + ".tmp", path)
    return path


def media_features(sf_dir: str):
    """queries() entry: synthesize the deterministic media corpus, run the
    decode stage, aggregate per aspect bucket. The SQL oracle cross-checks
    the decoder's byte-derived output against the parquet's metadata
    columns (payload header encodes width/height; body = bytes after the
    8-byte header)."""
    path = ensure_media_fixture()
    ds = ray.data.read_parquet(path)
    feats = media_pipeline(ds)
    from ray.data.aggregate import Count, Sum
    out = (feats.groupby("aspect_gt_1")
           .aggregate(Count(alias_name="n"),
                      Sum("decoded_bytes", alias_name="total_bytes"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("aspect_gt_1").reset_index(drop=True)


def _media_sql() -> str:
    import os
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "howard_ray_cache",
                        "media.parquet")
    return f"""
SELECT CAST(width > height AS BIGINT) AS aspect_gt_1,
       count(*) AS n,
       CAST(sum(octet_length(payload) - 8) AS BIGINT) AS total_bytes
FROM read_parquet('{path}')
GROUP BY 1 ORDER BY 1
"""


SQL["media_features"] = _media_sql()


FRAME_BYTES = 64     # fake fixed-size frame within the payload body
SAMPLE_EVERY = 4     # keep every 4th frame


class FakeFrameSampler:
    """STUB frame sampler (a real one would seek ffmpeg keyframes): treats
    the payload body as concatenated FRAME_BYTES-sized frames and keeps
    every SAMPLE_EVERY-th — the video frame-sampling stage shape (actor
    pool, byte-aware batches, typed metadata out). Deterministic, so the
    DuckDB oracle recomputes the sampled byte sum from the same blob."""

    def __init__(self, every: int = SAMPLE_EVERY):
        self.every = every  # a real sampler would init demuxer state here

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_frames, n_sampled, sums = [], [], [], []
        for mid, p in zip(batch["media_id"], batch["payload"]):
            body = np.frombuffer(p.as_py(), dtype=np.uint8, offset=8)
            nf = body.size // FRAME_BYTES
            frames = body[:nf * FRAME_BYTES].reshape(-1, FRAME_BYTES)
            sampled = frames[::self.every]
            ids.append(mid.as_py())
            n_frames.append(nf)
            n_sampled.append(len(sampled))
            sums.append(int(sampled.sum(dtype=np.int64)))
        return pa.table({
            "media_id": pa.array(ids, type=pa.string()),
            "n_frames": pa.array(n_frames, type=pa.int64()),
            "n_sampled": pa.array(n_sampled, type=pa.int64()),
            "sampled_sum": pa.array(sums, type=pa.int64()),
        })


def media_frame_sample(sf_dir: str):
    """queries() entry: frame-sample the deterministic media corpus via the
    actor-pool stage; per-media frame counts + exact integer byte sum of
    the sampled frames (integer output → float-free oracle)."""
    path = ensure_media_fixture()
    ds = ray.data.read_parquet(path)
    out = (ds.map_batches(FakeFrameSampler, batch_format="pyarrow",
                          batch_size=256, concurrency=(1, 4), num_cpus=1)
           .to_pandas())
    return out.sort_values("media_id").reset_index(drop=True)


def _frame_sample_sql() -> str:
    import os
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "howard_ray_cache",
                        "media.parquet")
    return f"""
WITH m AS (
  SELECT media_id, hex(payload) AS hx,
         (octet_length(payload) - 8) // {FRAME_BYTES} AS n_frames
  FROM read_parquet('{path}')),
s AS (
  SELECT media_id, n_frames,
         len(range(0, n_frames, {SAMPLE_EVERY})) AS n_sampled,
         coalesce(list_sum(list_transform(
           flatten(list_transform(range(0, n_frames, {SAMPLE_EVERY}),
             fr -> range(fr * {FRAME_BYTES}, (fr + 1) * {FRAME_BYTES}))),
           -- absolute byte p of the BODY sits at payload byte 8+p: hex
           -- chars 2*(8+p)+1 and +2 (1-based slices)
           p -> (strpos('0123456789ABCDEF', hx[2*(8+p)+1:2*(8+p)+1]) - 1) * 16
              + (strpos('0123456789ABCDEF', hx[2*(8+p)+2:2*(8+p)+2]) - 1))),
           0) AS sampled_sum
  FROM m)
SELECT media_id, n_frames::BIGINT AS n_frames,
       n_sampled::BIGINT AS n_sampled, sampled_sum::BIGINT AS sampled_sum
FROM s ORDER BY media_id
"""


SQL["media_frame_sample"] = _frame_sample_sql()


RESIZE_TARGET = 256  # longest-edge target for the fake resize


class FakeResizer:
    """STUB resize (a real one calls PIL.Image.resize): decimates the
    payload body by the integer factor that brings the longest metadata
    edge under RESIZE_TARGET — the thumbnail/preprocess stage of an image
    pipeline (actor pool, typed metadata out, byte-aware batches).
    Deterministic: output dims + the strided byte sum are recomputable
    from the blob, so the oracle is exact."""

    def __init__(self, target: int = RESIZE_TARGET):
        self.target = target  # a real resizer would init filters here

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ow, oh, fs, sums = [], [], [], [], []
        for mid, p, w, h in zip(batch["media_id"], batch["payload"],
                                batch["width"], batch["height"]):
            w, h = int(w.as_py()), int(h.as_py())
            f = max(1, -(-max(w, h) // self.target))   # ceil-div factor
            body = np.frombuffer(p.as_py(), dtype=np.uint8, offset=8)
            ids.append(mid.as_py())
            ow.append(w // f)
            oh.append(h // f)
            fs.append(f)
            sums.append(int(body[::f].sum(dtype=np.int64)))
        return pa.table({
            "media_id": pa.array(ids, type=pa.string()),
            "out_w": pa.array(ow, type=pa.int64()),
            "out_h": pa.array(oh, type=pa.int64()),
            "factor": pa.array(fs, type=pa.int64()),
            "resized_sum": pa.array(sums, type=pa.int64()),
        })


def media_resize(sf_dir: str):
    """queries() entry: resize stage over the deterministic media corpus;
    per-media output dims + exact strided byte sum (integer oracle)."""
    path = ensure_media_fixture()
    ds = ray.data.read_parquet(path)
    out = (ds.map_batches(FakeResizer, batch_format="pyarrow",
                          batch_size=256, concurrency=(1, 4), num_cpus=1)
           .to_pandas())
    return out.sort_values("media_id").reset_index(drop=True)


def _resize_sql() -> str:
    import os
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "howard_ray_cache",
                        "media.parquet")
    return f"""
WITH m AS (
  SELECT media_id, hex(payload) AS hx,
         octet_length(payload) - 8 AS bl, width, height,
         greatest(1, ceil(greatest(width, height)
                          / {RESIZE_TARGET}.0)::BIGINT) AS f
  FROM read_parquet('{path}'))
SELECT media_id, (width // f)::BIGINT AS out_w,
       (height // f)::BIGINT AS out_h, f AS factor,
       coalesce(list_sum(list_transform(range(0, bl, f),
         p -> (strpos('0123456789ABCDEF', hx[2*(8+p)+1:2*(8+p)+1]) - 1) * 16
            + (strpos('0123456789ABCDEF', hx[2*(8+p)+2:2*(8+p)+2]) - 1))),
         0)::BIGINT AS resized_sum
FROM m ORDER BY media_id
"""


SQL["media_resize"] = _resize_sql()
