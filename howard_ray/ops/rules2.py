"""Prioritization completeness: the reference's full PZ field family and
the transcript-level prioritization pass.

Reference semantics (howard/objects/variants.py):
- per criterion, on MATCHED rows only (the UPDATE's WHERE):
    PZScore += score            (HOWARD mode, :7600-7616; VaRank mode = max)
    PZFlag  AND= (flag=='PASS') (:7618-7625) -> any matched FILTERED
                                criterion filters the row
    PZClass  = list_concat(list_distinct(prev), class)   (:7627-7635)
    PZComment= ', '-joined criterion comments            (:7637-7655)
- PZTags pack: 'PZScore#<s>,PZFlag#<PASS|FILTERED>,PZClass#<cls or .>'
  (:7716-7797)
- transcript-level: the same engine runs over the exploded transcripts
  view with a PZT prefix, then the best transcript joins back to the
  variant row (:10195-10505).

Both are single vectorized map_batches passes (criteria -> numpy masks);
the transcript pass reuses the NOMEN candidate explode and does a
grouped argmax inside the batch — no shuffle, no driver loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .nomen import NCONST, _nmix, _sql_nmix, synth_hgvs
from .util import tbl
from .vfix import V_WITH

SQL: dict[str, str] = {}

# full-field profile over documents: class/comment per criterion; 'prime'
# appears twice to exercise the distinct-concat
PROFILE = [
    {"field": "n_chars", "op": "gt", "value": 500, "score": 2,
     "flag": "PASS", "class": "long", "comment": "long doc"},
    {"field": "lang", "op": "eq", "value": "en", "score": 1,
     "flag": "PASS", "class": "english", "comment": "english"},
    {"field": "source", "op": "eq", "value": "src0", "score": 3,
     "flag": "PASS", "class": "prime", "comment": "primary source"},
    {"field": "n_chars", "op": "lt", "value": 50, "score": 0,
     "flag": "FILTERED", "class": "short", "comment": "too short"},
    {"field": "text", "op": "contains", "value": "spark", "score": 1,
     "flag": "PASS", "class": "prime", "comment": "sparkish"},
]


def _mask(batch: pd.DataFrame, crit: dict) -> np.ndarray:
    col = batch[crit["field"]]
    if crit["op"] == "gt":
        return (col > crit["value"]).to_numpy()
    if crit["op"] == "lt":
        return (col < crit["value"]).to_numpy()
    if crit["op"] == "eq":
        return (col == crit["value"]).to_numpy()
    if crit["op"] == "contains":
        return col.str.contains(crit["value"], regex=False).fillna(False).to_numpy()
    raise ValueError(crit["op"])


def rule_pz_full(sf_dir: str):
    """Full PZ output: Score (HOWARD + VaRank modes), Flag, Class,
    Comment, Tags — one vectorized pass over documents."""
    ds = tbl(sf_dir, "documents",
             ["doc_id", "n_chars", "lang", "source", "text"])

    # class list in first-occurrence order (distinct-concat semantics)
    class_order = list(dict.fromkeys(c["class"] for c in PROFILE))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        masks = [_mask(batch, c) for c in PROFILE]
        score = np.zeros(n, dtype=np.int64)
        score_vr = np.zeros(n, dtype=np.int64)
        flag = np.ones(n, dtype=bool)
        for c, m in zip(PROFILE, masks):
            score += np.where(m, c["score"], 0)
            score_vr = np.where(m, np.maximum(score_vr, c["score"]), score_vr)
            if c["flag"] != "PASS":
                flag &= ~m
        cls_parts = []
        for cls in class_order:
            any_m = np.zeros(n, dtype=bool)
            for c, m in zip(PROFILE, masks):
                if c["class"] == cls:
                    any_m |= m
            cls_parts.append(np.where(any_m, cls, ""))
        def join(parts, sep):
            out = np.full(n, "", dtype=object)
            for p in parts:
                has = p != ""
                out = np.where(has & (out != ""), out + sep + p,
                               np.where(has, p, out))
            return out
        pzclass = join(cls_parts, ",")
        pzcomment = join([np.where(m, c["comment"], "")
                          for c, m in zip(PROFILE, masks)], ", ")
        flag_s = np.where(flag, "PASS", "FILTERED").astype(object)
        pztags = ("PZScore#" + score.astype(str).astype(object) + ",PZFlag#"
                  + flag_s + ",PZClass#"
                  + np.where(pzclass == "", ".", pzclass).astype(object))
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "PZScore": score, "PZScoreVaRank": score_vr,
            "PZFlag": flag_s, "PZClass": pzclass,
            "PZComment": pzcomment, "PZTags": pztags,
        })

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_M = {"long": "n_chars > 500", "english": "lang = 'en'",
      "prime": "(source = 'src0' OR text LIKE '%spark%')",
      "short": "n_chars < 50"}

SQL["rule_pz_full"] = f"""
WITH scored AS (
  SELECT doc_id,
    (CASE WHEN n_chars > 500 THEN 2 ELSE 0 END
     + CASE WHEN lang = 'en' THEN 1 ELSE 0 END
     + CASE WHEN source = 'src0' THEN 3 ELSE 0 END
     + CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END) AS PZScore,
    greatest(CASE WHEN n_chars > 500 THEN 2 ELSE 0 END,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END,
             CASE WHEN source = 'src0' THEN 3 ELSE 0 END,
             CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END) AS PZScoreVaRank,
    CASE WHEN n_chars < 50 THEN 'FILTERED' ELSE 'PASS' END AS PZFlag,
    concat_ws(',',
      CASE WHEN {_M['long']} THEN 'long' END,
      CASE WHEN {_M['english']} THEN 'english' END,
      CASE WHEN {_M['prime']} THEN 'prime' END,
      CASE WHEN {_M['short']} THEN 'short' END) AS PZClass,
    concat_ws(', ',
      CASE WHEN {_M['long']} THEN 'long doc' END,
      CASE WHEN {_M['english']} THEN 'english' END,
      CASE WHEN source = 'src0' THEN 'primary source' END,
      CASE WHEN {_M['short']} THEN 'too short' END,
      CASE WHEN text LIKE '%spark%' THEN 'sparkish' END) AS PZComment
  FROM documents)
SELECT doc_id, PZScore, PZScoreVaRank, PZFlag, PZClass, PZComment,
       'PZScore#' || PZScore || ',PZFlag#' || PZFlag || ',PZClass#'
         || (CASE WHEN PZClass = '' THEN '.' ELSE PZClass END) AS PZTags
FROM scored ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# transcript-level prioritization (PZT prefix + best-transcript join-back)
# ---------------------------------------------------------------------------

_KEY = ["chrom", "pos", "ref", "alt"]

# transcript profile: preferred list +3 (PASS), exon annotation +1
# (PASS), NR_ +2 but FILTERED — a high-scoring NR transcript can WIN the
# join-back and filter the variant, exercising the flag path
from .nomen import PREFERRED


def rule_pz_transcripts(sf_dir: str):
    """Explode each variant's transcript candidates, score them with a
    transcript profile (PZT fields), pick the best per variant (strictly
    greater replaces -> first wins ties) and join it back to the variant
    row (reference variants.py:10195-10505)."""
    from .vfix import variants_ds
    ds = variants_ds(sf_dir, columns=["vidx"] + _KEY)

    def f(batch: pa.Table) -> pa.Table:
        withh = synth_hgvs(batch)
        hgvs = pd.Series(withh["hgvs"].to_numpy(zero_copy_only=False))
        n = len(hgvs)
        cands = hgvs.str.split(",")
        n_cand = cands.str.len().to_numpy()
        row = np.repeat(np.arange(n), n_cand)
        total = int(n_cand.sum())
        # n==0 guards (same as nomen.find_nomen_batch): an empty Ray block
        # must produce an empty frame, not a broadcast error
        offs = np.concatenate(([0], np.cumsum(n_cand)[:-1])) \
            if n else np.array([], int)
        ordn = np.arange(total) - np.repeat(offs, n_cand)
        flat = pd.Series(np.concatenate(cands.to_numpy()) if n else [],
                         dtype=object)
        # transcript token = first ':'-separated field matching [NX][MR]_
        toks = flat.str.split(":")
        tr = flat.str.extract(r"(?:^|:)([NX][MR]_[^:]+)", expand=False)
        tr_base = tr.str.split(".").str[0]
        is_nm = tr.str.startswith("NM_").fillna(False).to_numpy()
        is_nr = tr.str.startswith("NR_").fillna(False).to_numpy()
        pref = tr_base.isin(PREFERRED).to_numpy()
        has_exon = flat.str.contains(r"(?:^|:)exon", regex=True).to_numpy()
        score = (np.where(is_nr, 2, 0) + np.where(pref, 3, 0)
                 + np.where(has_exon, 1, 0)).astype(np.int64)
        flag = ~is_nr  # NR_ criterion is FILTERED
        order = np.lexsort((ordn, -score, row))
        first = order[np.searchsorted(row[order], np.arange(n))]
        out = withh.select(_KEY).to_pandas()
        out["PZTTranscript"] = tr.to_numpy()[first]
        out["PZTScore"] = score[first]
        out["PZTFlag"] = np.where(flag[first], "PASS", "FILTERED")
        return out

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    return out.sort_values(_KEY).reset_index(drop=True)


def _build_pzt_sql() -> str:
    tA = f"(1000 + {_sql_nmix('tA')})"
    tB = f"(1000 + {_sql_nmix('tB')})"
    b_is_nm = f"({_sql_nmix('btype')} = 0)"
    # candidate A: exon (+1), preferred if tA<1020 (+3); candidate B:
    # NM -> preferred bonus only, NR -> +2 (FILTERED)
    scoreA = f"(1 + CASE WHEN {tA} < 1020 THEN 3 ELSE 0 END)"
    scoreB = (f"(CASE WHEN {b_is_nm} THEN "
              f"(CASE WHEN {tB} < 1020 THEN 3 ELSE 0 END) ELSE 2 END)")
    b_wins = f"({scoreB} > {scoreA})"
    tvA = f"'NM_' || {tA} || '.' || (1 + {_sql_nmix('vA')})"
    tvB = (f"(CASE WHEN {b_is_nm} THEN 'NM_' ELSE 'NR_' END) || {tB}"
           f" || '.' || (1 + {_sql_nmix('vB')})")
    return f"""
{V_WITH}
SELECT chrom, pos, ref, alt,
       CASE WHEN {b_wins} THEN {tvB} ELSE {tvA} END AS PZTTranscript,
       CAST(CASE WHEN {b_wins} THEN {scoreB} ELSE {scoreA} END AS BIGINT) AS PZTScore,
       CASE WHEN {b_wins} AND NOT {b_is_nm} THEN 'FILTERED' ELSE 'PASS' END AS PZTFlag
FROM v ORDER BY chrom, pos, ref, alt
"""


SQL["rule_pz_transcripts"] = _build_pzt_sql()
