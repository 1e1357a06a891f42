"""Second tranche of HOWARD-semantics operators:

- trio_classify       ← TRIO barcode → denovo/dominant/recessive
                        (howard/functions/commons.py:1190-1222)
- annotate_update     ← annotations update mode: overwrite existing key
                        (variants.py:6144-6157) vs append-only-if-empty
                        (variants.py:6207-6210)
- rename_info_fields  ← batched regex renames inside packed INFO
                        (variants.py:11839-11950)
- hgvs_name           ← basic g.-notation naming (SNV/del/ins) — the
                        deterministic core of annotation_hgvs
                        (variants.py:7821-8202) without the genome FASTA
- transcript_rank     ← NOMEN-style best-candidate selection: rank exploded
                        annotations per variant, keep the best
                        (find_nomen scoring, commons.py:510-711)
- transcripts_to_json ← transcript_view_to_variants re-aggregation
                        (variants.py:11475-11838), JSON list per variant
- rank_within_chrom   ← per-partition ordered rank (sorted export analog,
                        commons.py:2386-2398)
- anti_join_unmatched ← distributed anti join (variants with no store hit)
- hgvs_transcript     ← broadcast transcript-interval index lookup
- hgvs_context        ← stateful sequence-context actor (genome broadcast)

All over the sf-scaled vfix fixture: Ray side generates inside map_batches
from the lineitem key table; oracle side is the same closed-form CTE
(vfix.V_WITH / TX_SQL), so the gate stresses these at any sf.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .vfix import (CHROMS, GENOME_PATH, TX_SQL, V_WITH, ann_cols,
                   ensure_genome, gen_genome_chrom, gen_transcripts,
                   variants_ds)

SQL: dict[str, str] = {}


def trio_classify(sf_dir: str):
    """TRIO inheritance classification from the 3-sample barcode
    (father=sample1, mother=sample2, child=sample3): '001' → denovo,
    parent-hom patterns → recessive, else dominant/unknown — the reference's
    trio() scalar (commons.py:1190-1222) vectorized over the barcode."""
    ds = variants_ds(sf_dir, ["chrom", "pos", "ref", "alt",
                              "sample1", "sample2", "sample3"])

    def f(batch: pa.Table) -> pa.Table:
        def digit(col):
            g = pc.list_element(pc.split_pattern(batch[col], ":"), 0)
            return pc.if_else(
                pc.is_in(g, value_set=pa.array(["./.", "0/0"])), "0",
                pc.if_else(pc.is_in(g, value_set=pa.array(["0/1", "1/0"])),
                           "1", "2"))
        bc = pc.binary_join_element_wise(
            digit("sample1"), digit("sample2"), digit("sample3"), "")
        child = pc.utf8_slice_codeunits(bc, 2, 3)
        parents = pc.utf8_slice_codeunits(bc, 0, 2)
        cls = pc.if_else(
            pc.equal(child, "0"), "unknown",
            pc.if_else(pc.equal(parents, "00"), "denovo",
                       pc.if_else(pc.and_(pc.equal(parents, "11"),
                                          pc.equal(child, "2")),
                                  "recessive", "dominant")))
        return pa.table({"chrom": batch["chrom"], "pos": batch["pos"],
                         "ref": batch["ref"], "alt": batch["alt"],
                         "barcode": bc, "trio": cls})

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    return out.sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)


def _gt_digit(col: str) -> str:
    return (f"CASE WHEN string_split({col}, ':')[1] IN ('./.', '0/0') THEN '0' "
            f"WHEN string_split({col}, ':')[1] IN ('0/1', '1/0') THEN '1' "
            f"ELSE '2' END")


SQL["trio_classify"] = f"""{V_WITH},
bc AS (
  SELECT chrom, pos, ref, alt,
         ({_gt_digit('sample1')} || {_gt_digit('sample2')} || {_gt_digit('sample3')}) AS barcode
  FROM v)
SELECT chrom, pos, ref, alt, barcode,
       CASE WHEN substr(barcode, 3, 1) = '0' THEN 'unknown'
            WHEN substr(barcode, 1, 2) = '00' THEN 'denovo'
            WHEN substr(barcode, 1, 1) = '1' AND substr(barcode, 2, 1) = '1'
                 AND substr(barcode, 3, 1) = '2' THEN 'recessive'
            ELSE 'dominant' END AS trio
FROM bc ORDER BY chrom, pos, ref, alt
"""


def rename_info_fields(sf_dir: str):
    """Batched field renames inside the packed INFO string (reference:
    125 regexes per UPDATE pass, variants.py:11839-11950). Renames
    DP→DEPTH and AA→ANCESTRAL in one vectorized pass."""
    ds = variants_ds(sf_dir, ["chrom", "pos", "ref", "alt", "info"])

    def f(batch: pa.Table) -> pa.Table:
        info = pc.binary_join_element_wise(";", batch["info"], "")
        for old, new in (("DP", "DEPTH"), ("AA", "ANCESTRAL")):
            info = pc.replace_substring(info, f";{old}=", f";{new}=")
        info = pc.utf8_slice_codeunits(info, 1)  # drop the guard ';'
        return pa.table({"chrom": batch["chrom"], "pos": batch["pos"],
                         "ref": batch["ref"], "alt": batch["alt"],
                         "info": info})

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    return out.sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)


SQL["rename_info_fields"] = f"""{V_WITH}
SELECT chrom, pos, ref, alt,
       substr(replace(replace(';' || info, ';DP=', ';DEPTH='),
                      ';AA=', ';ANCESTRAL='), 2) AS info
FROM v ORDER BY chrom, pos, ref, alt
"""


def hgvs_name(sf_dir: str):
    """Basic HGVS g.-notation per variant: SNV → chrom:g.POSref>alt,
    longer-ref → deletion g.POS_ENDdel, longer-alt → insertion
    g.POS_POS+1ins<suffix> (the deterministic naming core of the
    reference's annotation_hgvs stateful stage, variants.py:7821-8202)."""
    ds = variants_ds(sf_dir, ["chrom", "pos", "ref", "alt"])

    def f(batch: pa.Table) -> pa.Table:
        pos = batch["pos"]
        ref = batch["ref"]
        alt = batch["alt"]
        lr = pc.utf8_length(ref)
        la = pc.utf8_length(alt)
        snv = pc.and_(pc.equal(lr, 1), pc.equal(la, 1))
        deletion = pc.greater(lr, la)
        s = lambda x: pc.cast(x, pa.string())
        prefix = pc.binary_join_element_wise(batch["chrom"], ":g.", "")
        snv_name = pc.binary_join_element_wise(
            prefix, s(pos), ref, ">", alt, "")
        del_name = pc.binary_join_element_wise(
            prefix, s(pc.add(pos, 1)), "_",
            s(pc.subtract(pc.add(pos, lr), 1)), "del", "")
        ins_name = pc.binary_join_element_wise(
            prefix, s(pos), "_", s(pc.add(pos, 1)), "ins",
            pc.utf8_slice_codeunits(alt, 1), "")
        name = pc.if_else(snv, snv_name,
                          pc.if_else(deletion, del_name, ins_name))
        return pa.table({"chrom": batch["chrom"], "pos": pos,
                         "ref": ref, "alt": alt, "hgvs": name})

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    return out.sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)


SQL["hgvs_name"] = f"""{V_WITH}
SELECT chrom, pos, ref, alt,
       CASE WHEN length(ref) = 1 AND length(alt) = 1
              THEN chrom || ':g.' || CAST(pos AS VARCHAR) || ref || '>' || alt
            WHEN length(ref) > length(alt)
              THEN chrom || ':g.' || CAST(pos + 1 AS VARCHAR) || '_' ||
                   CAST(pos + length(ref) - 1 AS VARCHAR) || 'del'
            ELSE chrom || ':g.' || CAST(pos AS VARCHAR) || '_' ||
                 CAST(pos + 1 AS VARCHAR) || 'ins' || substr(alt, 2)
       END AS hgvs
FROM v ORDER BY chrom, pos, ref, alt
"""


EFFECT_RANK = {"missense": 2, "synonymous": 1}


def transcript_rank(sf_dir: str):
    """NOMEN-style best-candidate pick: explode annotations (as in
    ann_explode), score each (missense > synonymous, tie-break on allele),
    keep the top-ranked annotation per variant (find_nomen candidate
    scoring, commons.py:655-667: max-rank row wins)."""
    ds = variants_ds(sf_dir, ["chrom", "pos", "ref", "alt"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        # two candidates per INPUT ROW (missense/ref, synonymous/alt);
        # the winner is the max (rank_score, -allele) — row-local argmax,
        # no key grouping (duplicate variant keys each keep their own row)
        r_m, r_s = EFFECT_RANK["missense"], EFFECT_RANK["synonymous"]
        pick_m = ((r_m > r_s)
                  | ((r_m == r_s) & (batch["ref"] <= batch["alt"])))
        d = batch[["chrom", "pos", "ref", "alt"]].copy()
        d["allele"] = batch["ref"].where(pick_m, batch["alt"])
        d["effect"] = np.where(pick_m, "missense", "synonymous")
        return d

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)


# the SQL twin ranks per PHYSICAL row (row_number rid — vidx is not
# row-unique in the lineitem key table), keeping one best candidate per
# input row like the Ray side
SQL["transcript_rank"] = f"""{V_WITH},
v2 AS (SELECT *, row_number() OVER () AS rid FROM v),
exploded AS (
  SELECT rid, chrom, pos, ref, alt, ref AS allele, 'missense' AS effect, 2 AS rank_score
  FROM v2
  UNION ALL
  SELECT rid, chrom, pos, ref, alt, alt AS allele, 'synonymous', 1
  FROM v2)
SELECT chrom, pos, ref, alt, allele, effect
FROM exploded
QUALIFY row_number() OVER (PARTITION BY rid
                           ORDER BY rank_score DESC, allele) = 1
ORDER BY chrom, pos, ref, alt
"""


def rank_within_chrom(sf_dir: str):
    """Per-chromosome position rank — ordered-output analog (the reference
    sorts VCF output per chrom, functions/commons.py:2386-2398); partition
    by chrom, sort within group (no global sort)."""
    ds = variants_ds(sf_dir, ["vidx", "chrom", "pos", "ref", "alt"])

    def per_chrom(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pos", "ref", "alt", "vidx"]).reset_index(drop=True)
        g["rank_in_chrom"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["chrom", "pos", "ref", "alt", "rank_in_chrom"]]

    out = (ds.groupby("chrom").map_groups(per_chrom, batch_format="pandas")
           .to_pandas())
    return (out.sort_values(["chrom", "pos", "ref", "alt", "rank_in_chrom"])
               .reset_index(drop=True))


SQL["rank_within_chrom"] = f"""{V_WITH}
SELECT chrom, pos, ref, alt,
       row_number() OVER (PARTITION BY chrom ORDER BY pos, ref, alt, vidx) AS rank_in_chrom
FROM v ORDER BY chrom, pos, ref, alt, rank_in_chrom
"""


def anti_join_unmatched(sf_dir: str):
    """Distributed anti join: variants with NO exact-annotation hit.
    Both sides scale with sf, so this is a keyed shuffle (left_outer join,
    keep where the store side is null) — not a broadcast key set, which
    would grow with the data (round-1 verdict: no driver-side
    materialization of a store that tracks input size)."""
    def key_side(batch: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            batch["chrom"], pc.cast(batch["pos"], pa.string()),
            batch["ref"], batch["alt"], "_")
        return pa.table({"k": k, "chrom": batch["chrom"], "pos": batch["pos"],
                         "ref": batch["ref"], "alt": batch["alt"]})

    def store_keys(batch: pa.Table) -> pa.Table:
        vidx = batch["vidx"].to_numpy()
        cover, _ = ann_cols(vidx)
        k = pc.binary_join_element_wise(
            batch["chrom"], pc.cast(batch["pos"], pa.string()),
            batch["ref"], batch["alt"], "_")
        # distinct keys per batch; the join multiplies matches, and an anti
        # join only needs key PRESENCE — dedup before the shuffle
        return pa.table({"k": pc.unique(k.filter(pa.array(cover < 6)))})

    left = (variants_ds(sf_dir, ["chrom", "pos", "ref", "alt"])
            .map_batches(key_side, batch_format="pyarrow"))
    # global key dedup via the grouped AGGREGATE (vectorized partial+final),
    # not map_groups — a per-group Python lambda would run once per distinct
    # key (~|variants| calls at scale)
    from ray.data.aggregate import Count
    store = (variants_ds(sf_dir, ["vidx", "chrom", "pos", "ref", "alt"])
             .map_batches(store_keys, batch_format="pyarrow")
             .groupby("k").aggregate(Count(alias_name="hit")))
    joined = left.join(store, join_type="left_outer", num_partitions=16,
                       on=("k",))

    def keep_unmatched(batch: pa.Table) -> pa.Table:
        m = pc.is_null(batch["hit"])
        return pa.table({"chrom": batch["chrom"].filter(m),
                         "pos": batch["pos"].filter(m),
                         "ref": batch["ref"].filter(m),
                         "alt": batch["alt"].filter(m)})

    out = joined.map_batches(keep_unmatched, batch_format="pyarrow").to_pandas()
    return out.sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)


SQL["anti_join_unmatched"] = f"""{V_WITH}
SELECT v.chrom, v.pos, v.ref, v.alt
FROM v
ANTI JOIN (SELECT chrom, pos, ref, alt FROM v WHERE cover < 6) a
  ON v.chrom = a.chrom AND v.pos = a.pos AND v.ref = a.ref AND v.alt = a.alt
ORDER BY v.chrom, v.pos, v.ref, v.alt
"""


def transcripts_to_json(sf_dir: str):
    """Re-aggregate exploded annotations back onto variants as an ordered
    comma-joined list (transcript_view_to_variants, variants.py:11475-11838;
    JSON-per-variant collapsed to a deterministic string)."""
    ds = variants_ds(sf_dir, ["chrom", "pos", "ref", "alt"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ann = (batch["ref"] + "|missense," + batch["alt"] + "|synonymous")
        parts = ann.str.split(",").map(sorted).str.join(";")
        return pd.DataFrame({"chrom": batch["chrom"], "pos": batch["pos"],
                             "ref": batch["ref"], "alt": batch["alt"],
                             "transcripts": parts})

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)


SQL["transcripts_to_json"] = f"""{V_WITH},
v2 AS (SELECT *, row_number() OVER () AS rid FROM v),
exploded AS (
  SELECT rid, chrom, pos, ref, alt,
         unnest(string_split(ref || '|missense,' || alt || '|synonymous', ',')) AS ann
  FROM v2)
SELECT chrom, pos, ref, alt,
       string_agg(ann, ';' ORDER BY ann) AS transcripts
FROM exploded GROUP BY rid, chrom, pos, ref, alt
ORDER BY chrom, pos, ref, alt
"""


def annotate_update(sf_dir: str):
    """Annotation UPDATE mode: remove any existing value for the key from
    INFO first, then append the fresh one (the reference deletes the old
    key via regexp before re-annotating, variants.py:6144-6157 — vs append
    mode which only fills empties, :6207-6210). Here DP is 'refreshed' to
    DP*2 to exercise delete-then-append."""
    ds = variants_ds(sf_dir, ["chrom", "pos", "ref", "alt", "info"])

    def f(batch: pa.Table) -> pa.Table:
        padded = pc.binary_join_element_wise(
            pa.array([";"] * batch.num_rows), batch["info"], "")
        dp = pc.cast(pc.struct_field(
            pc.extract_regex(padded, r";DP=(?P<v>[^;]*)"), "v"), pa.int64())
        stripped = pc.replace_substring_regex(padded, r";DP=[^;]*", "")
        new_info = pc.utf8_ltrim(pc.binary_join_element_wise(
            stripped, ";DP=", pc.cast(pc.multiply(dp, 2), pa.string()), ""),
            characters=";")
        return pa.table({"chrom": batch["chrom"], "pos": batch["pos"],
                         "ref": batch["ref"], "alt": batch["alt"],
                         "info": new_info})

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    return out.sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)


SQL["annotate_update"] = f"""{V_WITH}
SELECT chrom, pos, ref, alt,
       ltrim(regexp_replace(';' || info, ';DP=[^;]*', '', 'g')
             || ';DP=' || CAST(CAST(regexp_extract(';' || info, ';DP=([^;]*)', 1) AS BIGINT) * 2 AS VARCHAR),
             ';') AS info
FROM v ORDER BY chrom, pos, ref, alt
"""


# ---------------------------------------------------------------------------
# hgvs_transcript: broadcast transcript-interval index lookup
# (reference annotation_hgvs, variants.py:7821-8202 — the refseq interval
# index side; the sequence-context stage over the genome is hgvs_context)
# ---------------------------------------------------------------------------

def hgvs_transcript(sf_dir: str):
    """Transcript-relative HGVS naming via a broadcast per-chromosome sorted
    transcript-interval index (ray.put once, actor-held lookup per batch —
    the broadcast-small-side discipline; no shuffle):

    - candidate transcripts: tx_start <= pos <= tx_end (prefix-max-end
      bounded window, fully vectorized flat gather as in annotate_regions);
    - best transcript per variant: NM_ before NR_ (the reference's
      transcript-precedence rule, commons.py:655-667), then lexicographic
      tx_id;
    - coordinate: strand '+' -> pos - tx_start + 1, '-' -> tx_end - pos + 1;
      prefix c. for NM_ (coding), n. for NR_ (non-coding);
    - suffix: SNV ref>alt, longer-ref 'del', longer-alt 'ins'+alt[1:].
    Variants outside every transcript emit empty tx_id/tx_hgvs.
    """
    tx = gen_transcripts()
    by_chrom = {}
    for c, g in tx.groupby("chrom"):
        g = g.sort_values(["tx_start", "tx_end", "tx_id"]).reset_index(drop=True)
        ends = g["tx_end"].to_numpy()
        by_chrom[c] = (g["tx_start"].to_numpy(), ends,
                       np.maximum.accumulate(ends),
                       g["tx_id"].to_numpy(), g["strand"].to_numpy())
    tx_ref = ray.put(by_chrom)

    class TxLookup:
        def __init__(self):
            self.by_chrom = ray.get(tx_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            n = len(batch)
            tx_out = np.full(n, "", dtype=object)
            hgvs_out = np.full(n, "", dtype=object)
            pos = batch["pos"].to_numpy()
            ref = batch["ref"].to_numpy()
            alt = batch["alt"].to_numpy()
            chroms = batch["chrom"].to_numpy()
            for c in np.unique(chroms):
                entry = self.by_chrom.get(c)
                if entry is None:
                    continue
                m = chroms == c
                starts, ends, pmax_end, tx_ids, strands = entry
                pos_c = pos[m]
                hi = np.searchsorted(starts, pos_c, side="right")
                lo = np.minimum(
                    np.searchsorted(pmax_end, pos_c, side="left"), hi)
                counts = hi - lo
                if counts.sum() == 0:
                    continue
                rows_rep = np.repeat(np.flatnonzero(m), counts)
                offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
                cand = (np.arange(counts.sum())
                        - np.repeat(offs, counts) + np.repeat(lo, counts))
                keep = ends[cand] >= np.repeat(pos_c, counts)
                rows_k, cand_k = rows_rep[keep], cand[keep]
                if not len(rows_k):
                    continue
                # best per variant: NM_ (prio 0) before NR_, then tx_id
                cdf = pd.DataFrame({
                    "row": rows_k,
                    "prio": np.where(
                        pd.Series(tx_ids[cand_k]).str.startswith("NM_"), 0, 1),
                    "tx_id": tx_ids[cand_k],
                    "tx_start": starts[cand_k],
                    "tx_end": ends[cand_k],
                    "strand": strands[cand_k],
                }).sort_values(["row", "prio", "tx_id"])
                best = cdf.groupby("row", as_index=False).head(1)
                r = best["row"].to_numpy()
                plus = best["strand"].to_numpy() == "+"
                cpos = np.where(plus, pos[r] - best["tx_start"].to_numpy() + 1,
                                best["tx_end"].to_numpy() - pos[r] + 1)
                ctype = np.where(best["prio"].to_numpy() == 0, "c.", "n.")
                lr = pd.Series(ref[r]).str.len().to_numpy()
                la = pd.Series(alt[r]).str.len().to_numpy()
                suffix = np.where(
                    (lr == 1) & (la == 1),
                    pd.Series(ref[r]).str.cat(pd.Series(alt[r]), sep=">"),
                    np.where(lr > la, "del",
                             "ins" + pd.Series(alt[r]).str.slice(1)))
                tx_out[r] = best["tx_id"].to_numpy()
                hgvs_out[r] = (best["tx_id"].to_numpy() + ":" + ctype
                               + cpos.astype(str) + suffix)
            return pd.DataFrame({"chrom": batch["chrom"], "pos": batch["pos"],
                                 "ref": batch["ref"], "alt": batch["alt"],
                                 "tx_id": tx_out.astype(str),
                                 "tx_hgvs": hgvs_out.astype(str)})

    ds = variants_ds(sf_dir, ["chrom", "pos", "ref", "alt"])
    out = (ds.map_batches(TxLookup, batch_format="pandas", concurrency=(1, 4))
           .to_pandas())
    return out.sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)


SQL["hgvs_transcript"] = f"""{V_WITH},
v2 AS (SELECT *, row_number() OVER () AS rid FROM v),
t AS ({TX_SQL})
SELECT v2.chrom, v2.pos, v2.ref, v2.alt,
       COALESCE(t.tx_id, '') AS tx_id,
       COALESCE(t.tx_id || ':'
         || CASE WHEN t.tx_id LIKE 'NM%' THEN 'c.' ELSE 'n.' END
         || CAST(CASE WHEN t.strand = '+' THEN v2.pos - t.tx_start + 1
                      ELSE t.tx_end - v2.pos + 1 END AS VARCHAR)
         || CASE WHEN length(v2.ref) = 1 AND length(v2.alt) = 1
                   THEN v2.ref || '>' || v2.alt
                 WHEN length(v2.ref) > length(v2.alt) THEN 'del'
                 ELSE 'ins' || substr(v2.alt, 2) END, '') AS tx_hgvs
FROM v2
LEFT JOIN t
  ON v2.chrom = t.chrom AND t.tx_start <= v2.pos AND t.tx_end >= v2.pos
QUALIFY row_number() OVER (
  PARTITION BY v2.rid
  ORDER BY CASE WHEN t.tx_id IS NULL THEN 2
                WHEN t.tx_id LIKE 'NM%' THEN 0 ELSE 1 END, t.tx_id) = 1
ORDER BY v2.chrom, v2.pos, v2.ref, v2.alt
"""


# ---------------------------------------------------------------------------
# hgvs_context: stateful sequence-context actor (the reference's FASTA-holding
# HGVS stage, variants.py:7821-8202 — Fasta handle per worker at :8128)
# ---------------------------------------------------------------------------

def hgvs_context(sf_dir: str):
    """Per-variant reference-sequence context: each actor holds the genome
    (built ONCE per actor in ``__init__`` from the closed-form generator —
    the sf-independent equivalent of broadcasting the FASTA), and per batch
    gathers the trinucleotide window around every position with vectorized
    fancy indexing — the model-scorer shape: heavyweight state per actor,
    zero state per batch. Emits the REF-vs-genome agreement flag and the
    pos-1..pos+1 context string."""
    ensure_genome()  # parquet twin for the SQL oracle

    class SeqContext:
        def __init__(self):
            self.genome = {CHROMS[c]: np.frombuffer(
                gen_genome_chrom(c).encode(), dtype=np.uint8)
                for c in range(len(CHROMS))}

        def __call__(self, batch: pa.Table) -> pa.Table:
            chrom = np.asarray(batch["chrom"].to_pylist(), dtype=object)
            pos = batch["pos"].to_numpy()
            ref1 = pc.utf8_slice_codeunits(batch["ref"], 0, 1).to_pylist()
            match = np.zeros(len(pos), dtype=np.int64)
            ctx = np.empty(len(pos), dtype=object)
            for ch in np.unique(chrom):
                m = chrom == ch
                seq = self.genome[ch]
                idx = pos[m] - 1                      # 1-based -> 0-based
                # window start clamped at the chromosome head (pos=1)
                w = np.maximum(idx - 1, 0)
                tri = np.ascontiguousarray(np.stack(
                    [seq[w], seq[w + 1], seq[w + 2]], axis=1).astype(np.uint8))
                # one-shot stringify: view the (n,3) byte rows as S3 then
                # cast to unicode — no per-row tobytes/decode loop
                ctx[m] = tri.view("S3").ravel().astype("U3")
                match[m] = (seq[idx] ==
                            np.frombuffer("".join(
                                np.asarray(ref1, dtype=object)[m]).encode(),
                                dtype=np.uint8)).astype(np.int64)
            return pa.table({"chrom": batch["chrom"], "pos": batch["pos"],
                             "ref": batch["ref"], "alt": batch["alt"],
                             "ref_match": pa.array(match),
                             "context": pa.array(ctx.tolist())})

    ds = variants_ds(sf_dir, ["chrom", "pos", "ref", "alt"])
    out = (ds.map_batches(SeqContext, batch_format="pyarrow",
                          concurrency=(1, 4))
           .to_pandas())
    return out.sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)


SQL["hgvs_context"] = f"""{V_WITH}
SELECT v.chrom, v.pos, v.ref, v.alt,
       CAST(substr(g.seq, v.pos, 1) = substr(v.ref, 1, 1) AS BIGINT)
         AS ref_match,
       substr(g.seq, greatest(v.pos - 1, 1), 3) AS context
FROM v JOIN '{GENOME_PATH}' g USING (chrom)
ORDER BY v.chrom, v.pos, v.ref, v.alt
"""
