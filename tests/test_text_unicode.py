"""Multibyte/unicode hardening for the Arrow-native text operators: a
synthetic documents table full of CJK, accents, emoji, combining marks
and mixed scripts runs through the SAME op + SQL-twin pair the driver
gate uses — catching byte-vs-codepoint drift (utf8_length vs length,
Horner hash over UTF-8 bytes vs hex-decode, marker matching on
non-ASCII tokens) that the mostly-ASCII sf fixtures can't."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from howard_ray.ops import all_oracle_sql, all_queries

DOCS = [
    ("u/doc-0", "的 和 快 跑 的", "zh", "web", 0),
    ("u/doc-1", "le vite café déjà-vu et", "fr", "books", 0),
    ("u/doc-2", "the fast naïve 快 and of", "en", "web", 0),
    ("u/doc-3", "🚀 emoji 🎉 party 🚀", "en", "forum", 0),
    ("u/doc-4", "éclair combining é marks", "fr", "news", 0),
    ("u/doc-5", "der die und schnell straße", "de", "papers", 0),
    ("u/doc-6", "", "en", "web", 0),          # empty text
    ("u/doc-7", "   ", "en", "web", 0),       # whitespace runs
    ("u/doc-8", "el y rapido mañana la", "es", "wiki", 0),
    ("u/doc-9", "ascii only plain words here", "en", "legal", 0),
]


@pytest.fixture(scope="module")
def uni_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("unidocs")
    t = pa.table({
        "doc_id": pa.array([r[0] for r in DOCS]),
        "text": pa.array([r[1] for r in DOCS]),
        "lang": pa.array([r[2] for r in DOCS]),
        "source": pa.array([r[3] for r in DOCS]),
        "n_chars": pa.array([len(r[1]) for r in DOCS], type=pa.int64()),
    })
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ["token_stats", "quality_by_source",
                                  "lang_id", "fingerprints",
                                  "explode_word_counts"])
def test_text_op_matches_oracle_on_unicode(ray_session, uni_dir, name):
    res = to_frame(all_queries()[name](uni_dir))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{os.path.join(uni_dir, 'documents.parquet')}'")
    exp = con.execute(all_oracle_sql()[name]).fetchdf()
    res = res.reset_index(drop=True)
    exp = exp.reset_index(drop=True)
    assert list(res.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(res, exp, check_dtype=False)


def to_frame(x) -> pd.DataFrame:
    import ray.data
    if isinstance(x, ray.data.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x
