"""Text-analysis operators over the ``documents`` table: tokenization /
explode, field extraction, token counting, quality scoring, language-ID
heuristic, document fingerprinting.

These extend the reference's string-parsing operator family (INFO explode
via regexp, howard/objects/variants.py:1771-1986; snpEff ANN explode,
functions/commons.py:885-968) to the training-data-pipeline operations the
engine targets. All hot paths are vectorized (pandas .str / pyarrow.compute);
stateful pieces (compiled regexes, stopword tables) live in actor __init__.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .util import tbl

SQL: dict[str, str] = {}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")


def explode_word_counts(sf_dir: str):
    """Explode text to one row per word (flat_map analog of the reference's
    transcript explode, variants.py:10859-11201) + grouped count.
    Tokenization = split on single space, matching the oracle's
    string_split semantics exactly."""
    ds = tbl(sf_dir, "documents", ["text"])

    def words(batch: pa.Table) -> pa.Table:
        # split_pattern matches DuckDB string_split: keeps empty strings
        lists = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(lists)
        vc = pc.value_counts(flat)
        return pa.table({"word": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    out = (ds.map_batches(words, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas())
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values("word").reset_index(drop=True)


SQL["explode_word_counts"] = """
SELECT w AS word, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY w ORDER BY word
"""


class PropsParser:
    """Regex field extraction from a packed string column — the reference's
    explode_infos (INFO 'k=v' → typed column via REGEXP_EXTRACT,
    variants.py:1894-1929) applied to events.props JSON. Arrow-native
    (round-3 verdict item #5): pc.extract_regex over the zero-copy string
    batch; the pattern string is per-actor state."""

    def __init__(self):
        self.pat = r'"k": (?P<k>\d+)'

    def __call__(self, batch: pa.Table) -> pa.Table:
        hit = pc.extract_regex(batch["props"], self.pat)
        k = pc.cast(pc.struct_field(hit, "k"), pa.int64())
        return pa.table({"event_type": batch["event_type"], "k": k})


def parse_props(sf_dir: str):
    out = (tbl(sf_dir, "events", ["event_type", "props"])
           .map_batches(PropsParser, batch_format="pyarrow", concurrency=(1, 4))
           .groupby("event_type")
           .aggregate(Sum("k", alias_name="sum_k"), Count(alias_name="n"))
           .to_pandas())
    out["sum_k"] = out["sum_k"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL["parse_props"] = """
SELECT event_type,
       CAST(sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


def token_stats(sf_dir: str):
    """Whitespace token counting per doc, aggregated per source (the
    token-counting primitive of a training-data pipeline)."""
    ds = tbl(sf_dir, "documents", ["source", "text"])

    def f(batch: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(pc.split_pattern(batch["text"], " "))
        return pa.table({"source": batch["source"],
                         "n_tok": pc.cast(n_tok, pa.int64())})

    from ray.data.aggregate import Max, Min
    out = (ds.map_batches(f, batch_format="pyarrow")
             .groupby("source")
             .aggregate(Sum("n_tok", alias_name="sum_tok"),
                        Min("n_tok", alias_name="min_tok"),
                        Max("n_tok", alias_name="max_tok"),
                        Count(alias_name="n_docs"))
             .to_pandas())
    for c in ["sum_tok", "min_tok", "max_tok", "n_docs"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


SQL["token_stats"] = """
SELECT source,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tok,
       min(len(string_split(text, ' ')))  AS min_tok,
       max(len(string_split(text, ' ')))  AS max_tok,
       count(*)                           AS n_docs
FROM documents GROUP BY source ORDER BY source
"""


class QualityScorer:
    """Per-doc quality signals: stopword ratio and mean word length —
    Arrow-native (round-3 verdict item #5): utf8_length / count_substring
    / split_pattern string kernels on the zero-copy batch, one flattened
    is_in over the batch's whole word stream, bincount per row — no
    pandas object-array conversion of the corpus. Stop set built once per
    actor (reference stateful-stage shape, variants.py:8128)."""

    def __init__(self):
        self.stop = pa.array(sorted(STOPWORDS))

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n = pc.cast(pc.add(pc.count_substring(text, " "), 1),
                    pa.float64()).to_numpy(zero_copy_only=False)
        chars = pc.cast(pc.utf8_length(text),
                        pa.float64()).to_numpy(zero_copy_only=False)
        total_chars = chars - (n - 1)  # chars minus separators
        words = pc.split_pattern(text, " ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        hit = pc.is_in(flat, value_set=self.stop) \
            .to_numpy(zero_copy_only=False)
        row = np.repeat(np.arange(batch.num_rows), lens)
        n_stop = np.bincount(row, weights=hit, minlength=batch.num_rows)
        return pa.table({
            "source": batch["source"],
            "stop_ratio": pa.array(n_stop / n),
            "mean_wlen": pa.array(total_chars / n),
        })


def quality_by_source(sf_dir: str):
    out = (tbl(sf_dir, "documents", ["source", "text"])
           .map_batches(QualityScorer, batch_format="pyarrow", concurrency=(1, 4))
           .groupby("source")
           .aggregate(Sum("stop_ratio", alias_name="s_stop"),
                      Sum("mean_wlen", alias_name="s_wlen"),
                      Count(alias_name="n_docs"))
           .to_pandas())
    out["avg_stop_ratio"] = (out["s_stop"] / out["n_docs"]).round(4)
    out["avg_word_len"] = (out["s_wlen"] / out["n_docs"]).round(4)
    out["n_docs"] = out["n_docs"].astype("int64")
    return (out[["source", "n_docs", "avg_stop_ratio", "avg_word_len"]]
            .sort_values("source").reset_index(drop=True))


SQL["quality_by_source"] = """
WITH per_doc AS (
  SELECT source,
         len(list_filter(string_split(text, ' '),
             w -> w IN ('the','a','of','and','to','in','is','on'))) * 1.0
           / len(string_split(text, ' ')) AS stop_ratio,
         (length(text) - len(string_split(text, ' ')) + 1) * 1.0
           / len(string_split(text, ' ')) AS mean_wlen
  FROM documents)
SELECT source, count(*) AS n_docs,
       round(avg(stop_ratio), 4) AS avg_stop_ratio,
       round(avg(mean_wlen), 4)  AS avg_word_len
FROM per_doc GROUP BY source ORDER BY source
"""


class LangId:
    """n-gram/stopword-score language-ID heuristic: score each language by
    marker-word hits, argmax with deterministic tie-break (alphabetical).
    SQL twin: distinct-word ⋈ marker-table join + windowed argmax."""

    MARKERS = {
        "en": {"the", "and", "of", "fast", "slow"},
        "fr": {"le", "la", "et", "vite"},
        "es": {"el", "la", "y", "rapido"},
        "de": {"der", "die", "und", "schnell"},
        "zh": {"的", "和", "快"},
    }

    def __init__(self):
        self.langs = sorted(self.MARKERS)
        # marker multimap ("la" belongs to fr AND es): one value_set per
        # language, matched against the batch's per-batch word DICTIONARY
        # (tiny) instead of the full flattened stream
        self.marker_sets = [pa.array(sorted(self.MARKERS[l]))
                            for l in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Arrow-native scoring (round-3 verdict item #5): flatten words
        # with row ids, dictionary-encode the stream, dedupe (row, code)
        # pairs in numpy, then mark marker words per language on the
        # DICTIONARY and scatter-count per (row, lang); argmax picks the
        # first (= alphabetical) max
        n_rows = batch.num_rows
        words = pc.split_pattern(batch["text"], " ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        denc = pc.dictionary_encode(
            pc.list_flatten(words)).combine_chunks()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = denc.dictionary
        n_vocab = max(1, len(vocab))
        pair = np.unique(rows * n_vocab + codes)
        urow, ucode = pair // n_vocab, pair % n_vocab
        score = np.zeros((n_rows, len(self.langs)), dtype=np.int64)
        for li, vs in enumerate(self.marker_sets):
            m = pc.is_in(vocab, value_set=vs).to_numpy(zero_copy_only=False)
            hits = m[ucode]
            if hits.any():
                np.add.at(score, (urow[hits], li), 1)
        best = score.argmax(axis=1)
        pred = np.where(score.max(axis=1) > 0,
                        np.array(self.langs, dtype=object)[best], "unknown")
        return pa.table({"doc_id": batch["doc_id"],
                         "lang": batch["lang"],
                         "pred_lang": pa.array(pred.astype("U"))})


def lang_id(sf_dir: str):
    out = (tbl(sf_dir, "documents", ["doc_id", "lang", "text"])
           .map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


_MARKER_VALUES = ",".join(
    f"('{w}','{l}')" for l in sorted(LangId.MARKERS)
    for w in sorted(LangId.MARKERS[l]))

SQL["lang_id"] = f"""
WITH markers(word, mlang) AS (VALUES {_MARKER_VALUES}),
words AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
  FROM documents),
scores AS (
  SELECT w.doc_id, m.mlang, count(*) AS score
  FROM words w JOIN markers m USING (word)
  GROUP BY 1, 2),
best AS (
  SELECT doc_id, mlang AS pred_lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, mlang ASC) AS rn
  FROM scores)
SELECT d.doc_id, d.lang, coalesce(b.pred_lang, 'unknown') AS pred_lang
FROM documents d
LEFT JOIN (SELECT doc_id, pred_lang FROM best WHERE rn = 1) b USING (doc_id)
ORDER BY doc_id
"""


def _pow_u64(base: np.uint64, exps: np.ndarray) -> np.ndarray:
    """Vectorized base**exps mod 2^64 (binary exponentiation, wrapping
    uint64) — O(n_docs * log(max_len)) instead of a text-length cumprod."""
    result = np.ones(exps.size, dtype=np.uint64)
    b = np.uint64(base)
    e = exps.astype(np.uint64).copy()
    with np.errstate(over="ignore"):
        while e.any():
            odd = (e & np.uint64(1)).astype(bool)
            result[odd] = result[odd] * b
            b = b * b
            e = e >> np.uint64(1)
    return result


HORNER_BASE = 1099511628211  # FNV prime
# BASE is odd, hence invertible mod 2^64: segmented power reset is a
# multiply by INV_BASE^segment_start instead of a per-document cumprod
_HORNER_INV = pow(HORNER_BASE, -1, 1 << 64)


def horner_hash_u64(texts_in) -> np.ndarray:
    """Vectorized 64-bit polynomial (Rabin-Karp-style) string hash:
    sum(byte[i] * BASE^i) mod 2^64 per string, computed over ONE flat
    concatenated buffer — global cumprod of powers, renormalized per
    segment via the modular inverse, per-string sums via add.reduceat (no
    per-string loop). Deterministic across processes AND SQL-expressible
    (hex-decode + HUGEINT Horner list_reduce), which is what lets MinHash
    signatures and document fingerprints share a DuckDB oracle."""
    texts = [t.encode("utf-8") for t in texts_in]
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    flat = (np.frombuffer(b"".join(texts), dtype=np.uint8)
            if texts else np.array([], dtype=np.uint8))
    return _horner_flat(flat, lens)


def horner_hash_arrow(col) -> np.ndarray:
    """Arrow fast path (round-3 verdict item #5): the hash runs over the
    string column's UTF-8 VALUE BUFFER directly — Arrow's storage IS the
    concatenated byte stream the algorithm wants, so no per-string encode
    loop and no object-array conversion. Same values as horner_hash_u64."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if a.null_count:
        a = pc.fill_null(a, "")
    if pa.types.is_large_string(a.type):
        a = a.cast(pa.string())
    off = np.frombuffer(a.buffers()[1], dtype=np.int32)[
        a.offset: a.offset + len(a) + 1]
    data = np.frombuffer(a.buffers()[2] or b"", dtype=np.uint8)
    lens = np.diff(off).astype(np.int64)
    flat = data[off[0]: off[-1]] if len(off) else \
        np.array([], dtype=np.uint8)
    return _horner_flat(flat, lens)


def _horner_flat(flat_u8: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Core of the segmented Horner hash over one concatenated byte
    buffer; ``lens`` gives the per-string segment lengths."""
    fps = np.zeros(len(lens), dtype=np.uint64)
    nz = lens > 0
    if nz.any():
        flat = flat_u8.astype(np.uint64)
        with np.errstate(over="ignore"):
            pows = np.full(flat.size, HORNER_BASE, dtype=np.uint64)
            pows[0] = 1
            np.cumprod(pows, out=pows)  # BASE^i (global position i)
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1][nz]
            # INV_BASE^start per STRING (n-sized binary exponentiation +
            # cumprod), not a second full-text-length cumprod — that array
            # was ~8x the batch's text bytes of transient memory gathered
            # at only n points
            per_doc = _pow_u64(np.uint64(_HORNER_INV), lens[nz])
            seg_scale = np.cumprod(
                np.concatenate(([np.uint64(1)], per_doc[:-1]))
                .astype(np.uint64))
            flat *= pows
            del pows
            sums = np.add.reduceat(flat, starts)
            fps[nz] = sums * seg_scale
    return fps


class Fingerprinter:
    """64-bit rolling polynomial (Rabin-Karp-style) document fingerprint over
    the raw bytes — deterministic across processes; vectorized via numpy
    cumulative products on uint64 (wrapping arithmetic) straight off the
    Arrow value buffer."""

    BASE = HORNER_BASE

    INV_BASE = _HORNER_INV

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = horner_hash_arrow(batch["text"])
        return pa.table({"doc_id": batch["doc_id"],
                         "fingerprint": pa.array(fps.view(np.int64))})


def fingerprints(sf_dir: str):
    out = (tbl(sf_dir, "documents", ["doc_id", "text"])
           .map_batches(Fingerprinter, batch_format="pyarrow", concurrency=(1, 4))
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


# SQL twin of the rolling hash: hex-decode the UTF-8 bytes, Horner-reduce
# over the reversed byte list in HUGEINT arithmetic mod 2^64 (list_reduce
# acc*BASE + b == sum(byte[i] * BASE^i)), reinterpret as signed int64.
SQL["fingerprints"] = f"""
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
  FROM documents),
fp AS (
  SELECT doc_id,
    list_reduce(
      list_prepend(0::HUGEINT,
        list_transform(range(n - 1, -1, -1),
          i -> ((strpos('0123456789ABCDEF', h[2*i+1:2*i+1]) - 1) * 16
               + (strpos('0123456789ABCDEF', h[2*i+2:2*i+2]) - 1))::HUGEINT)),
      (acc, b) -> (acc * {Fingerprinter.BASE} + b)
                  % 18446744073709551616::HUGEINT) AS u
  FROM hx)
SELECT doc_id,
  (CASE WHEN u >= 9223372036854775808::HUGEINT
        THEN u - 18446744073709551616::HUGEINT ELSE u END)::BIGINT
    AS fingerprint
FROM fp ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# redaction + repetition filter (training-data hygiene stages)
# ---------------------------------------------------------------------------

# In production these are PII patterns (emails, phone numbers, IP addresses);
# over the synthetic corpus we redact a term class so the oracle has matches.
# The regex is module-level: compiled once per worker PROCESS import — no
# actor needed (see ops/similarity.py for the actor-vs-task rule).
REDACT_PATTERN = r"\b(spark|batch)\b"
REDACT_TOKEN = "<X>"


def redact_terms(sf_dir: str):
    """Pattern redaction over the corpus (the PII-scrub stage of a
    training-data pipeline): count and replace regex matches per doc with
    Arrow RE2 kernels on the zero-copy string column (round-5 item #3 —
    no pandas copy of the text batch), aggregate redaction counts and
    post-scrub sizes per source. Exact SQL twin via
    regexp_extract_all/regexp_replace."""
    ds = tbl(sf_dir, "documents", ["source", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        hits = pc.count_substring_regex(batch["text"], REDACT_PATTERN)
        after = pc.replace_substring_regex(batch["text"], REDACT_PATTERN,
                                           REDACT_TOKEN)
        return pa.table({"source": batch["source"],
                         "n_redactions": pc.cast(hits, pa.int64()),
                         "chars_after": pc.cast(pc.utf8_length(after),
                                                pa.int64())})

    out = (ds.map_batches(scrub, batch_format="pyarrow")
             .groupby("source")
             .aggregate(Count(alias_name="n_docs"),
                        Sum("n_redactions", alias_name="n_redactions"),
                        Sum("chars_after", alias_name="sum_chars_after"))
             .to_pandas())
    for c in ["n_docs", "n_redactions", "sum_chars_after"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


SQL["redact_terms"] = f"""
SELECT source, count(*) AS n_docs,
  sum(len(regexp_extract_all(text, '{REDACT_PATTERN}')))::BIGINT
    AS n_redactions,
  sum(length(regexp_replace(text, '{REDACT_PATTERN}', '{REDACT_TOKEN}', 'g')))::BIGINT
    AS sum_chars_after
FROM documents GROUP BY source ORDER BY source
"""


REP_THRESHOLD = 0.8  # duplicate-word fraction above which a doc is flagged


def repetition_filter(sf_dir: str):
    """Gopher-style repetition quality filter: per-doc duplicate-word
    fraction (1 - distinct/total), flag docs above REP_THRESHOLD, aggregate
    flagged counts + mean fraction per source. Arrow-native (round-5 item
    #3): split on the Arrow column, per-doc distinct via one lexsort over
    (row, word-hash) boundary diffs — 64-bit hash equality stands in for
    string equality, the documented collision class of the whole dedup
    family (``_shingle_hash_arrays``)."""
    ds = tbl(sf_dir, "documents", ["doc_id", "source", "text"])

    def frac(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(batch["text"].combine_chunks(), " ")
        offs = lists.offsets.to_numpy().astype(np.int64)
        lens = np.diff(offs)
        h = horner_hash_arrow(lists.values)
        row = np.repeat(np.arange(len(lens)), lens)
        order = np.lexsort((h, row))
        rs, hs = row[order], h[order]
        new = np.ones(len(rs), dtype=bool)
        if len(rs):
            new[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
        nuniq = np.bincount(rs[new], minlength=len(lens))
        dup_frac = 1.0 - nuniq / np.maximum(lens, 1)
        return pa.table({
            "source": batch["source"],
            "dup_frac": pa.array(dup_frac),
            "flagged": pa.array((dup_frac > REP_THRESHOLD)
                                .astype(np.int64))})

    out = (ds.map_batches(frac, batch_format="pyarrow")
             .groupby("source")
             .aggregate(Count(alias_name="n_docs"),
                        Sum("flagged", alias_name="n_flagged"),
                        Sum("dup_frac", alias_name="s_frac"))
             .to_pandas())
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_flagged"] = out["n_flagged"].astype("int64")
    out["avg_dup_frac"] = (out["s_frac"] / out["n_docs"]).round(4)
    return (out[["source", "n_docs", "n_flagged", "avg_dup_frac"]]
            .sort_values("source").reset_index(drop=True))


SQL["repetition_filter"] = f"""
WITH d AS (
  SELECT source,
         1.0 - len(list_distinct(string_split(text, ' ')))::DOUBLE
             / greatest(len(string_split(text, ' ')), 1) AS dup_frac
  FROM documents)
SELECT source, count(*) AS n_docs,
  sum((dup_frac > {REP_THRESHOLD})::BIGINT)::BIGINT AS n_flagged,
  round(avg(dup_frac), 4) AS avg_dup_frac
FROM d GROUP BY source ORDER BY source
"""


TFIDF_TOP = 3


def tfidf_topk(sf_dir: str, top: int = TFIDF_TOP):
    """Per-source top TF-IDF terms — the corpus-characterization aggregate
    a data-mixture pipeline runs per domain.

    tf(source, word) = occurrences of word in that source's docs;
    df(word) = number of docs (corpus-wide) containing word;
    tfidf = tf * ln(N_docs / df); top `top` words per source by
    (tfidf DESC, word ASC) on the 5dp-rounded score (deterministic
    tie-break shared with the SQL twin).

    One read pass: each doc lives in exactly one batch, so per-batch
    ``count_distinct(doc_id)`` partials per (source, word) sum to the
    exact global df (a doc has one source, so summing the per-source
    partials over sources never double-counts a doc). tf partials are
    plain grouped counts. The only shuffles are the two bounded grouped
    aggregates and one word-keyed join of (source,word,tf) against
    (word, df) — vocabulary-sized, not corpus-sized."""
    import math

    import ray

    ds = tbl(sf_dir, "documents", ["doc_id", "source", "text"])
    n_docs = ds.count()

    def partials(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(batch["text"], " ")
        nwords = pc.list_value_length(lists).to_numpy()
        flat = pc.list_flatten(lists)
        src = np.repeat(batch["source"].to_numpy(zero_copy_only=False),
                        nwords)
        did = np.repeat(batch["doc_id"].to_numpy(), nwords)
        t = pa.table({"source": pa.array(src), "word": flat,
                      "doc_id": pa.array(did)})
        g = t.group_by(["source", "word"]).aggregate(
            [("doc_id", "count"), ("doc_id", "count_distinct")])
        return pa.table({"source": g["source"], "word": g["word"],
                         "tf": pc.cast(g["doc_id_count"], pa.int64()),
                         "dfp": pc.cast(g["doc_id_count_distinct"],
                                        pa.int64())})

    parts = ds.map_batches(partials, batch_format="pyarrow")
    tf = (parts.groupby(["source", "word"])
               .aggregate(Sum("tf", alias_name="tf")))
    df = (parts.groupby("word")
               .aggregate(Sum("dfp", alias_name="df")))
    joined = tf.join(df, join_type="inner", num_partitions=8,
                     on=("word",))

    def score(batch: pa.Table) -> pa.Table:
        tfv = batch["tf"].to_numpy().astype(np.float64)
        dfv = batch["df"].to_numpy().astype(np.float64)
        s = np.round(tfv * np.log(float(n_docs) / dfv), 5)
        return pa.table({"source": batch["source"], "word": batch["word"],
                         "tfidf": pa.array(s)})

    def per_source(g: pa.Table) -> pa.Table:
        # Arrow fold (round-5 item #3): multi-key sort_indices + head
        idx = pc.sort_indices(g, sort_keys=[("tfidf", "descending"),
                                            ("word", "ascending")])
        return g.take(idx[:top])

    out = (joined.map_batches(score, batch_format="pyarrow")
                 .groupby("source")
                 .map_groups(per_source, batch_format="pyarrow")
                 .to_pandas())
    out["tfidf"] = out["tfidf"].astype("float64")
    return (out[["source", "word", "tfidf"]]
            .sort_values(["source", "word"]).reset_index(drop=True))


SQL["tfidf_topk"] = f"""
WITH tf AS (
  SELECT source, w AS word, count(*)::BIGINT AS tf
  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY source, w
), df AS (
  SELECT word, count(*)::BIGINT AS df FROM (
    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents)
  GROUP BY word
), s AS (
  SELECT tf.source, tf.word,
         round(tf.tf * ln((SELECT count(*) FROM documents)::DOUBLE / df.df),
               5) AS tfidf
  FROM tf JOIN df USING (word)
), top AS (
  SELECT source, word, tfidf FROM s
  QUALIFY row_number() OVER (PARTITION BY source
                             ORDER BY tfidf DESC, word) <= {TFIDF_TOP}
)
SELECT source, word, tfidf FROM top ORDER BY source, word
"""


QUALITY_TOPK = 5


def quality_topk_by_source(sf_dir: str, k: int = QUALITY_TOPK):
    """Per-source top-k docs by stopword-ratio quality score — the
    "best exemplars per domain" selection. No shuffle at all: each batch
    emits its per-source partial top-k (<= sources x k rows), the driver
    merges the tiny candidate union — the grouped analog of
    ann_cosine_topk's partial-top-k discipline. Score is rounded to 6dp
    BEFORE ranking on both engines so the (score DESC, doc_id ASC)
    tie-break is exact."""
    ds = tbl(sf_dir, "documents", ["doc_id", "source", "text"])
    stop_set = pa.array(sorted(STOPWORDS))

    def partial_topk(batch: pa.Table) -> pa.Table:
        # Arrow partials (round-5 item #3): split + is_in on the Arrow
        # word values, per-doc stopword counts via bincount scatter,
        # per-source top-k via one lexsort + segment-rank mask
        lists = pc.split_pattern(batch["text"].combine_chunks(), " ")
        offs = lists.offsets.to_numpy().astype(np.int64)
        lens = np.diff(offs)
        hit = pc.is_in(lists.values, value_set=stop_set) \
            .to_numpy(zero_copy_only=False)
        row = np.repeat(np.arange(len(lens)), lens)
        n_stop = np.bincount(row, weights=hit, minlength=len(lens))
        score = np.round(n_stop / np.maximum(lens, 1), 6)
        did = batch["doc_id"].to_numpy().astype(np.int64)
        senc = pc.dictionary_encode(batch["source"].combine_chunks())
        codes = np.asarray(senc.indices)
        order = np.lexsort((did, -score, codes))
        cs = codes[order]
        seg_start = np.zeros(len(cs), dtype=np.int64)
        if len(cs):
            b = np.zeros(len(cs), dtype=bool)
            b[0] = True
            b[1:] = cs[1:] != cs[:-1]
            starts = np.flatnonzero(b)
            seg_start = starts[np.cumsum(b) - 1]
        keep = (np.arange(len(cs)) - seg_start) < k
        sel = order[keep]
        return pa.table({
            "source": batch["source"].combine_chunks().take(
                pa.array(sel)),
            "doc_id": pa.array(did[sel]),
            "score": pa.array(score[sel])})

    cand = (ds.map_batches(partial_topk, batch_format="pyarrow")
              .to_pandas())
    cand = cand.sort_values(["source", "score", "doc_id"],
                            ascending=[True, False, True])
    out = cand.groupby("source", as_index=False).head(k).copy()
    out["rank"] = out.groupby("source").cumcount().astype("int64") + 1
    return (out[["source", "doc_id", "rank", "score"]]
            .sort_values(["source", "rank"]).reset_index(drop=True))


SQL["quality_topk_by_source"] = f"""
WITH per_doc AS (
  SELECT source, doc_id,
         round(len(list_filter(string_split(text, ' '),
               w -> w IN ({", ".join(f"'{w}'" for w in STOPWORDS)}))) * 1.0
               / len(string_split(text, ' ')), 6) AS score
  FROM documents),
r AS (
  SELECT source, doc_id, score,
         row_number() OVER (PARTITION BY source
                            ORDER BY score DESC, doc_id) AS rank
  FROM per_doc)
SELECT source, doc_id, rank, score FROM r WHERE rank <= {QUALITY_TOPK}
ORDER BY source, rank
"""
