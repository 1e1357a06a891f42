"""Config-driven rule/scoring engine — the reference's prioritization
operator re-expressed as one vectorized ``map_batches`` pass.

Reference semantics (howard/objects/variants.py:7073-7815): a *profile* is a
list of per-field criteria; each criterion is a typed comparison
(``gt/gte/lt/lte/equals/contains``, comparison_map variants.py:184-191) with
a score and a flag; execution accumulates score per row ("HOWARD" mode:
score += c, variants.py:7597-7616), ANDs flags (variants.py:7618-7625), and
collects per-criterion comments (variants.py:7637-7655). The reference runs
one SQL UPDATE per criterion; here every profile compiles to pyarrow.compute
masks evaluated in a single embarrassingly-parallel pass — no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .util import tbl

SQL: dict[str, str] = {}

_OPS = {
    "gt": pc.greater,
    "gte": pc.greater_equal,
    "lt": pc.less,
    "lte": pc.less_equal,
    "equals": pc.equal,
    "contains": lambda col, v: pc.match_substring(col, v),
}

# default profile over `documents` (analog of config/prioritization_profiles.json)
DEFAULT_PROFILE = [
    {"field": "n_chars", "type": "gt", "value": 500, "score": 2, "flag": True},
    {"field": "lang", "type": "equals", "value": "en", "score": 1, "flag": True},
    {"field": "source", "type": "equals", "value": "src0", "score": 3, "flag": True},
    {"field": "text", "type": "contains", "value": "spark", "score": 1, "flag": True},
    {"field": "n_chars", "type": "gte", "value": 50, "score": 0, "flag": False},
]


def compile_profile(profile: list[dict], mode: str = "howard"):
    """Compile criteria into one vectorized batch function producing
    PZScore (sum or max of matched scores) and PZFlag (AND over flag
    criteria: rows failing a flag=False criterion are flagged out)."""
    def apply(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        score = np.zeros(n, dtype=np.int64)
        flag = np.ones(n, dtype=bool)
        for crit in profile:
            mask_arr = _OPS[crit["type"]](batch[crit["field"]], crit["value"])
            mask = np.asarray(mask_arr.combine_chunks()
                              if isinstance(mask_arr, pa.ChunkedArray) else mask_arr)
            mask = np.nan_to_num(mask.astype(float), nan=0).astype(bool)
            if mode == "vvarank":  # VaRank: max score (variants.py:7597-7616)
                score = np.where(mask, np.maximum(score, crit["score"]), score)
            else:  # HOWARD: accumulate
                score = score + np.where(mask, crit["score"], 0)
            if not crit.get("flag", True):
                flag &= mask
        return pa.table({
            "doc_id": batch["doc_id"],
            "pzscore": pa.array(score),
            "pzflag": pa.array(flag.astype(np.int64)),
        })
    return apply


def rule_score_docs(sf_dir: str):
    ds = tbl(sf_dir, "documents", ["doc_id", "n_chars", "lang", "source", "text"])
    out = (ds.map_batches(compile_profile(DEFAULT_PROFILE), batch_format="pyarrow")
             .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


SQL["rule_score_docs"] = """
SELECT doc_id,
       (CASE WHEN n_chars > 500 THEN 2 ELSE 0 END
        + CASE WHEN lang = 'en' THEN 1 ELSE 0 END
        + CASE WHEN source = 'src0' THEN 3 ELSE 0 END
        + CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END) AS pzscore,
       CASE WHEN n_chars >= 50 THEN 1 ELSE 0 END            AS pzflag
FROM documents ORDER BY doc_id
"""
