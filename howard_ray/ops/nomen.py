"""Full NOMEN extraction (reference find_nomen, howard/functions/
commons.py:510-711; applied per-variant at variants.py:8897-9104):

Each variant carries an ``hgvs`` field = comma-separated candidate
nomenclatures, each a colon-separated list of tokens. Every candidate is
scored:  NM_/NR_/XM_/XR_ transcript token -> TVNOMEN/TNOMEN/VNOMEN (+1,
plus +2 for NM_ / +1 for NR_),  preferred-transcript list membership ->
+100 * (list_len - rank + 1),  c./g./m. -> CNOMEN (+1),  n. -> NNOMEN,
r. -> RNOMEN,  p. -> PNOMEN (+1),  exon... -> ENOMEN (+1),  anything else
-> GNOMEN (no score).  The best-scoring candidate (FIRST wins ties —
the reference replaces only on strictly greater) supplies the fields, and
NOMEN is the ':'-join of the non-null fields in the default pattern
GNOMEN:TNOMEN:ENOMEN:CNOMEN:RNOMEN:NNOMEN:PNOMEN.

The Ray side runs a REAL vectorized parser over the packed strings
(explode candidates -> explode tokens -> regex classify -> grouped argmax
— all inside one map_batches pass, no Python loop over rows). The oracle
reconstructs the expected winner CLOSED-FORM from the same mixes that
synthesized the hgvs field, so the parser is checked against an
independent derivation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .vfix import V_WITH

SQL: dict[str, str] = {}

_KEY = ["chrom", "pos", "ref", "alt"]

# preferred transcripts "file" (reference transcripts.tsv fixture shape):
# NM_1000..NM_1019, rank 1..20 -> boost 100 * (20 - rank + 1)
PREFERRED = {f"NM_{1000 + k}": k + 1 for k in range(20)}

# local mix constants (same (A, B, M) LCG scheme as vfix.CONST)
NCONST = {
    "tA":    (275604541, 101, 50),   # NM_{1000+tA}
    "vA":    (295075147, 103, 9),    # .{1+vA}
    "gene":  (314606869, 107, 100),  # GENE{gene}
    "aa":    (334214459, 109, 26),   # p.A{aa}G
    "ex":    (353868013, 113, 20),   # exon{1+ex}
    "tB":    (373587883, 127, 50),
    "vB":    (393342739, 131, 9),
    "btype": (413158511, 137, 2),    # 0 -> NM_, 1 -> NR_
}


def _nmix(i: np.ndarray, name: str) -> np.ndarray:
    a, b, m = NCONST[name]
    return (i * a + b) % m


def _sql_nmix(name: str, var: str = "vidx") -> str:
    a, b, m = NCONST[name]
    return f"(({var}*{a}+{b})%{m})"


def synth_hgvs(batch: pa.Table) -> pa.Table:
    """Deterministic 2-candidate hgvs per variant: a rich NM_ candidate
    (gene + transcript.version + c. + p. + exon) and a lean one (NM_ or
    NR_ + c. only) — the lean one wins only via the preferred-transcript
    boost, exercising the scoring paths."""
    i = batch["vidx"].to_numpy(zero_copy_only=False)
    pos = batch["pos"].to_numpy(zero_copy_only=False).astype(str)
    ref = np.asarray(batch["ref"].to_numpy(zero_copy_only=False), dtype=object)
    alt = np.asarray(batch["alt"].to_numpy(zero_copy_only=False), dtype=object)
    c = "c." + pd.Series(pos) + pd.Series(ref) + ">" + pd.Series(alt)
    tA = 1000 + _nmix(i, "tA")
    a_str = ("GENE" + pd.Series(_nmix(i, "gene")).astype(str)
             + ":NM_" + pd.Series(tA).astype(str)
             + "." + pd.Series(1 + _nmix(i, "vA")).astype(str)
             + ":" + c
             + ":p.A" + pd.Series(_nmix(i, "aa")).astype(str) + "G"
             + ":exon" + pd.Series(1 + _nmix(i, "ex")).astype(str))
    tB = 1000 + _nmix(i, "tB")
    bpre = np.where(_nmix(i, "btype") == 0, "NM_", "NR_")
    b_str = (pd.Series(bpre) + pd.Series(tB).astype(str)
             + "." + pd.Series(1 + _nmix(i, "vB")).astype(str) + ":" + c)
    return batch.append_column(
        "hgvs", pa.array((a_str + "," + b_str).to_numpy(), type=pa.string()))


_FIELD_COLS = ["TVNOMEN", "TNOMEN", "VNOMEN", "CNOMEN", "RNOMEN", "NNOMEN",
               "PNOMEN", "ENOMEN", "GNOMEN"]
_PATTERN = ["GNOMEN", "TNOMEN", "ENOMEN", "CNOMEN", "RNOMEN", "NNOMEN",
            "PNOMEN"]


def find_nomen_batch(hgvs: pd.Series,
                     preferred: dict[str, int] | None = None) -> pd.DataFrame:
    """Vectorized find_nomen (commons.py:510-711) over a Series of packed
    hgvs strings. Returns one row per input with the NOMEN fields + score."""
    if preferred is None:
        preferred = PREFERRED
    n_pref = len(preferred)
    n = len(hgvs)
    cands = hgvs.fillna("").str.split(",")
    n_cand = cands.str.len().to_numpy()
    row_of_cand = np.repeat(np.arange(n), n_cand)
    total = int(n_cand.sum())
    offs = np.concatenate(([0], np.cumsum(n_cand)[:-1])) if n else np.array([], int)
    cand_ord = np.arange(total) - np.repeat(offs, n_cand)
    flat_cand = pd.Series(np.concatenate(cands.to_numpy())if n else [],
                          dtype=object)
    toks = flat_cand.str.split(":")
    n_tok = toks.str.len().to_numpy()
    tok_cand = np.repeat(np.arange(len(flat_cand)), n_tok)
    flat_tok = pd.Series(
        np.concatenate(toks.to_numpy()) if len(toks) else [], dtype=object)

    is_t = flat_tok.str.match(r"^[NX][MR]_").to_numpy()
    is_nm = flat_tok.str.match(r"^NM_").to_numpy()
    is_nr = flat_tok.str.match(r"^NR_").to_numpy()
    is_tp = flat_tok.str.match(r"^[NX]P_").to_numpy()
    is_c = flat_tok.str.match(r"^[cgm]\.").to_numpy()
    is_n = flat_tok.str.match(r"^n\.").to_numpy()
    is_r = flat_tok.str.match(r"^r\.").to_numpy()
    is_p = flat_tok.str.match(r"^p\.").to_numpy()
    is_e = flat_tok.str.match(r"^exon").to_numpy()
    is_g = ~(is_t | is_tp | is_c | is_n | is_r | is_p | is_e)

    base = flat_tok.str.split(".").str[0]
    rank = base.map(preferred)
    tok_score = (is_t * 1 + is_nm * 2 + (is_nr & ~is_nm) * 1
                 + is_tp * 1 + is_c * 1 + is_n * 1 + is_r * 1
                 + is_p * 1 + is_e * 1)
    boost = np.where(is_t & rank.notna().to_numpy(),
                     100 * (n_pref - rank.fillna(0).to_numpy() + 1), 0)
    cand_score = np.zeros(len(flat_cand), dtype=np.int64)
    np.add.at(cand_score, tok_cand, tok_score + boost)

    # per-row argmax, FIRST candidate wins ties: order by (row, -score,
    # ordinal) and take the first per row
    order = np.lexsort((cand_ord, -cand_score, row_of_cand))
    first = order[np.searchsorted(row_of_cand[order], np.arange(n))]
    win_score = cand_score[first]

    # gather each field from the winning candidate's tokens
    win_of_tok = np.full(len(flat_cand), False)
    win_of_tok[first] = True
    tok_in_win = win_of_tok[tok_cand]
    tok_row = row_of_cand[tok_cand]

    out = pd.DataFrame(index=range(n))
    def gather(mask, values):
        col = np.full(n, None, dtype=object)
        sel = tok_in_win & mask
        # later tokens of the same class overwrite earlier (dict-set order)
        col[tok_row[sel]] = values[sel]
        return col

    tokv = flat_tok.to_numpy()
    out["TVNOMEN"] = gather(is_t, tokv)
    out["TNOMEN"] = gather(is_t, base.to_numpy())
    ver = flat_tok.str.split(".").str[1]
    out["VNOMEN"] = gather(is_t & ver.notna().to_numpy(), ver.to_numpy())
    out["CNOMEN"] = gather(is_c, tokv)
    out["RNOMEN"] = gather(is_r, tokv)
    out["NNOMEN"] = gather(is_n, tokv)
    out["PNOMEN"] = gather(is_p, tokv)
    out["ENOMEN"] = gather(is_e, tokv)
    out["GNOMEN"] = gather(is_g, tokv)
    parts = [out[f].fillna("") for f in _PATTERN]
    nomen = parts[0]
    for p in parts[1:]:
        nomen = nomen.where(p == "", nomen.where(nomen == "", nomen + ":") + p)
    out["NOMEN"] = nomen
    out["nomen_score"] = win_score
    return out


def nomen_extract(sf_dir: str):
    """Synthesize the hgvs field, then run the real parser — one streaming
    pass; the oracle recomputes the winner closed-form."""
    from .vfix import variants_ds
    ds = variants_ds(sf_dir, columns=["vidx"] + _KEY)

    def f(batch: pa.Table) -> pa.Table:
        withh = synth_hgvs(batch)
        fields = find_nomen_batch(pd.Series(
            withh["hgvs"].to_numpy(zero_copy_only=False)))
        out = withh.select(_KEY + ["hgvs"]).to_pandas()
        return pd.concat([out.reset_index(drop=True), fields], axis=1)

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    return out.sort_values(_KEY).reset_index(drop=True)


def _build_sql() -> str:
    cstr = "'c.' || CAST(pos AS VARCHAR) || ref || '>' || alt"
    tA = f"(1000 + {_sql_nmix('tA')})"
    tB = f"(1000 + {_sql_nmix('tB')})"
    b_is_nm = f"({_sql_nmix('btype')} = 0)"
    # scores: A = 6 + boostA; B(NM) = 4 + boostB; B(NR) = 3
    boostA = f"(CASE WHEN {tA} < 1020 THEN 100*(1020 - {tA}) ELSE 0 END)"
    boostB = f"(CASE WHEN {b_is_nm} AND {tB} < 1020 THEN 100*(1020 - {tB}) ELSE 0 END)"
    scoreA = f"(6 + {boostA})"
    scoreB = f"(CASE WHEN {b_is_nm} THEN 4 + {boostB} ELSE 3 END)"
    b_wins = f"({scoreB} > {scoreA})"
    tvA = f"'NM_' || {tA} || '.' || (1 + {_sql_nmix('vA')})"
    tvB = (f"(CASE WHEN {b_is_nm} THEN 'NM_' ELSE 'NR_' END) || {tB} "
           f"|| '.' || (1 + {_sql_nmix('vB')})")
    tnA = f"'NM_' || {tA}"
    tnB = f"(CASE WHEN {b_is_nm} THEN 'NM_' ELSE 'NR_' END) || {tB}"
    gene = f"'GENE' || {_sql_nmix('gene')}"
    pnom = f"'p.A' || {_sql_nmix('aa')} || 'G'"
    enom = f"'exon' || (1 + {_sql_nmix('ex')})"
    hgvs = (f"{gene} || ':' || {tvA} || ':' || {cstr} || ':' || {pnom}"
            f" || ':' || {enom} || ',' || {tvB} || ':' || {cstr}")
    # NOMEN pattern join: A -> GNOMEN:TNOMEN:ENOMEN:CNOMEN:PNOMEN,
    # B -> TNOMEN:CNOMEN
    nomA = (f"{gene} || ':' || {tnA} || ':' || {enom} || ':' || {cstr}"
            f" || ':' || {pnom}")
    nomB = f"{tnB} || ':' || {cstr}"
    return f"""
{V_WITH}
SELECT chrom, pos, ref, alt,
       {hgvs} AS hgvs,
       CASE WHEN {b_wins} THEN {tvB} ELSE {tvA} END AS TVNOMEN,
       CASE WHEN {b_wins} THEN {tnB} ELSE {tnA} END AS TNOMEN,
       CAST(CASE WHEN {b_wins} THEN 1 + {_sql_nmix('vB')}
                 ELSE 1 + {_sql_nmix('vA')} END AS VARCHAR) AS VNOMEN,
       {cstr} AS CNOMEN,
       CAST(NULL AS VARCHAR) AS RNOMEN,
       CAST(NULL AS VARCHAR) AS NNOMEN,
       CASE WHEN {b_wins} THEN NULL ELSE {pnom} END AS PNOMEN,
       CASE WHEN {b_wins} THEN NULL ELSE {enom} END AS ENOMEN,
       CASE WHEN {b_wins} THEN NULL ELSE {gene} END AS GNOMEN,
       CASE WHEN {b_wins} THEN {nomB} ELSE {nomA} END AS NOMEN,
       CAST(CASE WHEN {b_wins} THEN {scoreB} ELSE {scoreA} END AS BIGINT) AS nomen_score
FROM v ORDER BY chrom, pos, ref, alt
"""


SQL["nomen_extract"] = _build_sql()
