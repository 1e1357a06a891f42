"""Per-sample genotype operator family over the sf-scaled fixture (vfix),
reproducing the reference's calculation semantics as real output columns:

- GENOTYPECONCORDANCE  <- howard/functions/commons.py:1054-1098
    'TRUE' iff all samples with a non-null GT share ONE genotype
    (null GT = '', '.', './.', '.|.'; all-null rows -> 'FALSE').
- VAF normalization    <- commons.py:1225-1295 (AD branch)
    vaf = round(alt_depth / total_depth, 6) from AD='ad0,ad1'; '.' when
    total is 0; appended to each genotype (FORMAT grows ':VAF') and also
    emitted as typed float columns.
- VAF stats            <- commons.py:1298-1374 (genotype_stats)
    nb/min/max/mean over the per-sample VAFs; the reference's
    ``if vaf_float:`` guard EXCLUDES zero VAFs — mirrored here.
- BARCODEFAMILY        <- howard/objects/variants.py:9412-9605 +
    genotype_barcode commons.py:1101-1187: barcode digits over a pedigree
    SUBSET of samples (trio sample1..3), plus the BCFS sample list tag.

All vectorized map_batches stages; every query has a DuckDB oracle over
the shared closed-form CTE (vfix.V_WITH), so correctness is value-hashed
at any sf.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .vfix import V_WITH, SAMPLE_COLS

SQL: dict[str, str] = {}

_KEY = ["chrom", "pos", "ref", "alt"]
_NULL_GT = ("", ".", "./.", ".|.")


def _variants(sf_dir: str, columns):
    from .vfix import variants_ds
    return variants_ds(sf_dir, columns=columns)


def _split_sample(s: pd.Series):
    parts = s.str.split(":")
    gt = parts.str[0]
    dp = parts.str[1]
    ad = parts.str[2].str.split(",")
    ad0 = pd.to_numeric(ad.str[0])
    ad1 = pd.to_numeric(ad.str[1])
    return gt, dp, ad0, ad1


def genotype_concordance(sf_dir: str):
    """All-samples-agree flag (commons.py:1054-1098): distinct non-null
    GTs per row == 1. Vectorized over the batch's GT vocabulary (small)
    instead of a per-row Python set."""
    ds = _variants(sf_dir, _KEY + SAMPLE_COLS)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        gts = [batch[s].str.split(":", n=1).str[0] for s in SAMPLE_COLS]
        valid = [~g.isin(_NULL_GT) for g in gts]
        vocab = set()
        for g, v in zip(gts, valid):
            vocab.update(g[v].unique())
        ndistinct = np.zeros(len(batch), dtype=np.int64)
        for val in sorted(vocab):
            has = np.zeros(len(batch), dtype=bool)
            for g, v in zip(gts, valid):
                has |= (g == val).to_numpy() & v.to_numpy()
            ndistinct += has
        out = batch[_KEY].copy()
        out["genotypeconcordance"] = np.where(ndistinct == 1, "TRUE", "FALSE")
        out["gt_distinct"] = ndistinct
        return out

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values(_KEY).reset_index(drop=True)


def _sql_gt(s: str) -> str:
    return f"string_split({s}, ':')[1]"


SQL["genotype_concordance"] = f"""
{V_WITH}
SELECT chrom, pos, ref, alt,
       CASE WHEN len(list_distinct(list_filter(
                [{", ".join(_sql_gt(s) for s in SAMPLE_COLS)}],
                g -> g NOT IN ('', '.', './.', '.|.')))) = 1
            THEN 'TRUE' ELSE 'FALSE' END AS genotypeconcordance,
       len(list_distinct(list_filter(
                [{", ".join(_sql_gt(s) for s in SAMPLE_COLS)}],
                g -> g NOT IN ('', '.', './.', '.|.')))) AS gt_distinct
FROM v ORDER BY chrom, pos, ref, alt
"""


def vaf_normalize(sf_dir: str):
    """VAF from AD per sample (commons.py:1262-1283): typed vaf columns +
    the genotype string rewritten to GT:DP:AD:VAF ('.' when depth 0) +
    the widened FORMAT — one vectorized pass."""
    ds = _variants(sf_dir, _KEY + ["format"] + SAMPLE_COLS)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[_KEY].copy()
        out["format"] = batch["format"] + ":VAF"
        for idx, s in enumerate(SAMPLE_COLS, start=1):
            _, _, ad0, ad1 = _split_sample(batch[s])
            tot = ad0 + ad1
            raw = ad1 / tot
            # vectorized %.6f formatting (np.char.mod), no per-row lambda;
            # the NaN from 0/0 is masked to '.' right after
            vaf_str = pd.Series(
                np.char.mod("%.6f", raw.to_numpy(np.float64)),
                index=batch.index)
            vaf_str[tot == 0] = "."
            out[f"vaf{idx}"] = raw.round(6).where(tot > 0)
            out[s] = batch[s] + ":" + vaf_str
        return out

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values(_KEY).reset_index(drop=True)


def _sql_ad(s: str, j: int) -> str:
    return f"CAST(string_split(string_split({s}, ':')[3], ',')[{j}] AS BIGINT)"


def _sql_vaf(s: str) -> str:
    a0, a1 = _sql_ad(s, 1), _sql_ad(s, 2)
    return f"(CASE WHEN {a0}+{a1} > 0 THEN round(CAST({a1} AS DOUBLE)/({a0}+{a1}), 6) END)"


SQL["vaf_normalize"] = f"""
{V_WITH}
SELECT chrom, pos, ref, alt, format || ':VAF' AS format,
       {", ".join(f'''{_sql_vaf(s)} AS vaf{i},
       {s} || ':' || (CASE WHEN {_sql_ad(s,1)}+{_sql_ad(s,2)} > 0
                      THEN printf('%.6f', CAST({_sql_ad(s,2)} AS DOUBLE)/({_sql_ad(s,1)}+{_sql_ad(s,2)}))
                      ELSE '.' END) AS {s}'''
                  for i, s in enumerate(SAMPLE_COLS, start=1))}
FROM v ORDER BY chrom, pos, ref, alt
"""


def vaf_stats(sf_dir: str):
    """genotype_stats over VAF (commons.py:1298-1374): nb/min/max/mean of
    the per-sample VAFs, EXCLUDING zeros (the reference's truthiness
    guard) and null (zero-depth) samples."""
    ds = _variants(sf_dir, _KEY + SAMPLE_COLS)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        vafs = []
        for s in SAMPLE_COLS:
            _, _, ad0, ad1 = _split_sample(batch[s])
            tot = ad0 + ad1
            v = (ad1 / tot).round(6).where(tot > 0)
            vafs.append(v.where(v > 0))
        m = pd.concat(vafs, axis=1)
        out = batch[_KEY].copy()
        nb = m.notna().sum(axis=1).astype("int64")
        out["vaf_stats_nb"] = nb
        out["vaf_stats_min"] = m.min(axis=1)
        out["vaf_stats_max"] = m.max(axis=1)
        # sequential left-to-right sum (+= 0.0 for absent samples is an
        # IEEE identity), so the mean is the bit-identical double the SQL
        # twin's in-order list sum produces — no round-half ambiguity
        total = pd.Series(np.zeros(len(batch)), index=batch.index)
        for v in vafs:
            total = total + v.fillna(0.0)
        out["vaf_stats_mean"] = (total / nb).where(nb > 0)
        return out

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values(_KEY).reset_index(drop=True)


_VAF_LIST = ("list_filter([" + ", ".join(_sql_vaf(s) for s in SAMPLE_COLS)
             + "], x -> x IS NOT NULL AND x > 0)")

SQL["vaf_stats"] = f"""
{V_WITH}
SELECT chrom, pos, ref, alt,
       len({_VAF_LIST}) AS vaf_stats_nb,
       list_aggregate({_VAF_LIST}, 'min') AS vaf_stats_min,
       list_aggregate({_VAF_LIST}, 'max') AS vaf_stats_max,
       list_aggregate({_VAF_LIST}, 'sum') / nullif(len({_VAF_LIST}), 0) AS vaf_stats_mean
FROM v ORDER BY chrom, pos, ref, alt
"""


# pedigree subset: trio = father sample1, mother sample2, child sample3
# (reference loads this from a PED file/JSON, variants.py:9455-9476;
# here it is a fixed config constant of the fixture family)
FAMILY = ["sample1", "sample2", "sample3"]


def _barcode_digit(gt: pd.Series) -> pd.Series:
    """genotype_barcode (commons.py:1101-1187): compress GT digits
    ('.'->0), distinct-sorted; len1&'0'->0, len1 else->2, len>1->1."""
    def one(g: str) -> str:
        compressed = "".join(sorted(set(
            c for c in g.replace(".", "0") if c.isdigit())))
        if len(compressed) == 1:
            return "0" if compressed == "0" else "2"
        return "1" if compressed else "?"

    # GT vocabulary is tiny — map unique values once, not per row
    table = {u: one(u) for u in gt.unique()}
    return gt.map(table)


def barcode_family(sf_dir: str):
    """BARCODEFAMILY (variants.py:9412-9605): barcode over the pedigree
    subset of samples -> BCF tag, plus BCFS = the family sample list."""
    ds = _variants(sf_dir, _KEY + FAMILY)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[_KEY].copy()
        digits = [
            _barcode_digit(batch[s].str.split(":", n=1).str[0])
            for s in FAMILY]
        bcf = digits[0]
        for d in digits[1:]:
            bcf = bcf + d
        out["BCF"] = bcf
        out["BCFS"] = ",".join(FAMILY)
        return out

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values(_KEY).reset_index(drop=True)


def _sql_digit(s: str) -> str:
    g = _sql_gt(s)
    # fixture GT vocabulary is {0/0, 0/1, 1/1, ./.}; the digit map below
    # matches genotype_barcode on it ('./.' compresses to '0')
    return (f"(CASE WHEN {g} IN ('0/0', './.') THEN '0' "
            f"WHEN {g} IN ('0/1', '1/0') THEN '1' ELSE '2' END)")


SQL["barcode_family"] = f"""
{V_WITH}
SELECT chrom, pos, ref, alt,
       {" || ".join(_sql_digit(s) for s in FAMILY)} AS BCF,
       '{",".join(FAMILY)}' AS BCFS
FROM v ORDER BY chrom, pos, ref, alt
"""
