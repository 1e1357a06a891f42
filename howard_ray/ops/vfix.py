"""sf-scaled variants fixture (F2v2): a VCF-shaped table derived in CLOSED
FORM from the driver's ``lineitem`` table (the largest test table), so its
size tracks the scale factor (sf0.001 -> ~12k rows, sf0.01 -> ~120k,
sf0.1 -> ~1.2M) and the SAME derivation is expressible as a DuckDB SQL CTE
over the pre-registered ``lineitem`` view — every operator over it gets an
oracle at ANY sf.

Each lineitem row fans out to ``FANOUT`` variant rows; every field is a
small LCG mix of the unique variant index
``i = (l_orderkey*8 + l_linenumber)*FANOUT + k`` (l_linenumber is 1..7, so
the composite is unique; density is irrelevant to the mixes):

    field = (i * A + B) % M

with one (A, B, M) triple per field, held in ``CONST`` — the single source
of truth used by BOTH the numpy generator (`gen_variants_batch`) and the
SQL twin (`VSQL`). A pytest asserts the two sides are value-identical.

Schema (the reference's VCF tabular header, howard/objects/database.py:70):
chrom pos vid ref alt qual filter info format sample1..sample4, with INFO
packed as ';'-separated key=value (NS, DP, AA, MULTI (Number=2), optional
CLNSIG — reference INFO sub-schema semantics, variants.py:1889-1929) and
samples packed as 'GT:DP:AD' strings (commons.py:1024-1045).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

FANOUT = 2
BASES = ["A", "C", "G", "T"]
CHROMS = [f"chr{i}" for i in range(1, 23)] + ["chrX"]

# field -> (multiplier A, offset B, modulus M); i*A stays well inside int64
CONST: dict[str, tuple[int, int, int]] = {
    "u_chrom": (179426549, 7, 529),      # cidx = 22 - floor(sqrt(u)) -> chr1-heavy skew
    "pos":     (336860941, 11, 2999999),  # pos = 1 + r
    "refb":    (179424673, 13, 4),
    "altoff":  (15485863, 17, 3),         # alt = BASES[(refb + 1 + altoff) % 4]
    "r100":    (32452843, 19, 100),       # <5 del1, <10 del2, <15 ins1, <20 ins2, <25 mnv
    "xb1":     (86028121, 23, 4),
    "xb2":     (49979687, 29, 4),
    "vidr":    (67867967, 31, 10),        # <7 -> 'rs{i}' else '.'
    "q":       (256203161, 37, 400000),   # qual = q / 100.0
    "f10":     (22801763, 41, 10),        # <8 -> PASS else LowQual
    "ns":      (104395301, 43, 4),        # NS = 1 + r
    "dp":      (122949823, 47, 299),      # DP = 1 + r
    "aab":     (141650939, 53, 4),
    "cln":     (160481183, 59, 10),       # <2 pathogenic, <7 non-pathogenic, else absent
    # exact-annotation store membership + value
    "cover":   (193877777, 83, 10),       # <6 -> variant present in ann store
    "nci60":   (211229387, 89, 1000),     # value = r / 1000.0
}
# per-sample chains (sample s = 1..4)
for _s in range(1, 5):
    CONST[f"gt{_s}"] = (198491317 + _s * 7368787, 61 + _s, 100)
    CONST[f"sdp{_s}"] = (217645177 + _s * 9368787, 67 + _s, 99)
    CONST[f"ad0{_s}"] = (236887691 + _s * 11368789, 71 + _s, 50)
    CONST[f"ad1{_s}"] = (256203221 + _s * 13368797, 73 + _s, 50)

N_GENES = 80 * 23  # region store: sf-independent (small broadcast side)
GENE_CONST = {"gstart": (97003, 13, 2900000), "glen": (57301, 7, 195000)}

SAMPLE_COLS = ["sample1", "sample2", "sample3", "sample4"]


# ---------------------------------------------------------------------------
# numpy side
# ---------------------------------------------------------------------------

def _mix(i: np.ndarray, name: str) -> np.ndarray:
    a, b, m = CONST[name]
    return (i * a + b) % m


def gen_variants_batch(batch: pa.Table,
                       columns: list[str] | None = None) -> pa.Table:
    """lineitem-key batch -> FANOUT variant rows per lineitem, vectorized.
    ``columns`` prunes GENERATION itself (round-4): a caller that wants
    only (chrom, pos, ref, alt) skips the INFO/genotype string assembly —
    the projection-pushdown discipline applied to the synthesizer."""
    want = set(columns) if columns else None

    def need(*cs: str) -> bool:
        return want is None or any(c in want for c in cs)

    lo = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
    base = lo * 8 + ln
    i = (np.repeat(base, FANOUT) * FANOUT
         + np.tile(np.arange(FANOUT, dtype=np.int64), len(base)))
    n = len(i)
    b = np.array(BASES)

    cols: dict[str, pa.Array] = {}
    if need("vidx"):
        cols["vidx"] = pa.array(i)
    if need("chrom"):
        cidx = 22 - np.floor(np.sqrt(_mix(i, "u_chrom"))).astype(np.int64)
        cols["chrom"] = pa.array(np.array(CHROMS)[cidx].astype(object))
    if need("pos"):
        cols["pos"] = pa.array(1 + _mix(i, "pos"))
    if need("vid"):
        vid = np.where(_mix(i, "vidr") < 7,
                       np.char.add("rs", i.astype("U12")), ".")
        cols["vid"] = pa.array(vid.astype(object))
    if need("ref", "alt"):
        refb = _mix(i, "refb")
        r100 = _mix(i, "r100")
        mnv = (r100 >= 20) & (r100 < 25)
        # VCF anchor-style alleles: deletions keep the shared first base
        # (ref=XY.., alt=X), insertions extend it (ref=X, alt=XZ..), MNVs
        # stay delins. Round-5: each indel band is split into a 1-base
        # half and a 2-base half so the HGVS range forms (g1_g2 del,
        # insXY payload) are exercised by the oracle, not just the
        # justify/dup single-base algebra (ADVICE r4 #1). The 1–3-char
        # allele strings are built as raw Arrow value buffers (base-code
        # byte LUT scatter) — np.char.add was the dominant synthesis cost
        # (2.3 s of 2.8 s single-thread at 1.2M rows).
        del2 = (r100 >= 5) & (r100 < 10)
        ins2 = (r100 >= 15) & (r100 < 20)
        xb1i = _mix(i, "xb1")
        xb2i = _mix(i, "xb2")
        blut = np.frombuffer("".join(BASES).encode(), dtype=np.uint8)

        def _build3(c1: np.ndarray, c2: np.ndarray, c3: np.ndarray,
                    lens: np.ndarray) -> pa.Array:
            """String array of per-row prefixes of (c1, c2, c3) base
            codes with per-row length ``lens`` (1–3), zero-copy into
            Arrow offset/value buffers."""
            off = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=off[1:])
            vals = np.empty(off[-1], dtype=np.uint8)
            starts = off[:-1]
            vals[starts] = blut[c1]
            m2 = lens >= 2
            vals[starts[m2] + 1] = blut[c2[m2]]
            m3 = lens >= 3
            vals[starts[m3] + 2] = blut[c3[m3]]
            return pa.Array.from_buffers(
                pa.string(), len(lens),
                [None, pa.py_buffer(off.astype(np.int32).tobytes()),
                 pa.py_buffer(vals.tobytes())])

        if need("ref"):
            long_ref = r100 < 10
            len_r = (1 + (long_ref | mnv).astype(np.int64)
                     + del2.astype(np.int64))
            cols["ref"] = _build3(refb, xb1i, xb2i, len_r)
        if need("alt"):
            alt0 = (refb + 1 + _mix(i, "altoff")) % 4
            del_band = r100 < 10
            ins_band = (r100 >= 10) & (r100 < 20)
            c1 = np.where(del_band | ins_band, refb, alt0)
            len_a = np.where(del_band, 1,
                             np.where(ins2, 3,
                                      np.where(ins_band | mnv, 2, 1)))
            cols["alt"] = _build3(c1, xb2i, xb1i,
                                  len_a.astype(np.int64))
    if need("qual"):
        cols["qual"] = pa.array(_mix(i, "q") / 100.0)
    if need("filter"):
        filt = np.where(_mix(i, "f10") < 8, "PASS", "LowQual")
        cols["filter"] = pa.array(filt.astype(object))
    if need("info"):
        ns = 1 + _mix(i, "ns")
        dp = 1 + _mix(i, "dp")
        aa = b[_mix(i, "aab")]
        cln = _mix(i, "cln")
        clnsig = np.select([cln < 2, cln < 7],
                           ["pathogenic", "non-pathogenic"], "")
        ns_s, dp_s = ns.astype("U2"), dp.astype("U3")
        info = np.char.add(np.char.add(np.char.add("NS=", ns_s), ";DP="),
                           dp_s)
        info = np.char.add(np.char.add(info, ";AA="), aa)
        info = np.char.add(np.char.add(np.char.add(info, ";MULTI="), ns_s),
                           np.char.add(",", dp_s))
        info = np.where(clnsig != "",
                        np.char.add(np.char.add(info, ";CLNSIG="), clnsig),
                        info)
        cols["info"] = pa.array(info.astype(object))
    if need("format"):
        cols["format"] = pa.array(np.full(n, "GT:DP:AD", dtype=object))
    gt_lbl = np.array(["0/0", "0/1", "1/1", "./."])
    for s in range(1, 5):
        if not need(f"sample{s}"):
            continue
        g = _mix(i, f"gt{s}")
        gt = gt_lbl[np.select([g < 35, g < 65, g < 85], [0, 1, 2], 3)]
        val = np.char.add(np.char.add(gt, ":"),
                          _mix(i, f"sdp{s}").astype("U2"))
        val = np.char.add(np.char.add(val, ":"),
                          _mix(i, f"ad0{s}").astype("U2"))
        val = np.char.add(np.char.add(val, ","),
                          _mix(i, f"ad1{s}").astype("U2"))
        cols[f"sample{s}"] = pa.array(val.astype(object))
    return pa.table(cols)


def ann_cols(vidx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact-annotation store twin columns for a vidx vector: ``cover < 6``
    means "variant present in the annotation store", ``nci60`` is its value.
    The SQL CTE (V_WITH) emits the same pair per row — an op that joins
    against the store derives the store side from these instead of a
    driver-materialized parquet, so the store scales with sf like the
    variants themselves."""
    return _mix(vidx, "cover"), _mix(vidx, "nci60") / 1000.0


def variants_ds(sf_dir: str, columns: list[str] | None = None,
                num_blocks: int | None = None) -> ray.data.Dataset:
    """Lazy sf-scaled variants Dataset: generation happens inside
    map_batches (distributed, no driver materialization). ``num_blocks``
    bounds the read block count for consumers whose per-batch constant
    (e.g. hgvs_cdna's 23-chromosome scan) is amortized by fewer, larger
    batches."""
    ds = (ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_orderkey", "l_linenumber"],
                                override_num_blocks=num_blocks)
          .map_batches(lambda b, _c=columns: gen_variants_batch(b, _c),
                       batch_format="pyarrow"))
    if columns:
        ds = ds.select_columns(columns)
    return ds


def gen_regions() -> pd.DataFrame:
    """Small sf-independent interval store (genes), broadcast side."""
    g = np.arange(N_GENES, dtype=np.int64)
    cidx = g % 23
    a, bb, m = GENE_CONST["gstart"]
    start = 1 + (g * a + bb) % m
    a, bb, m = GENE_CONST["glen"]
    end = start + 5000 + (g * a + bb) % m
    return pd.DataFrame({
        "chrom": np.array(CHROMS)[cidx],
        "start": start, "end": end,
        "gene": [f"GENE_{CHROMS[c]}_{gi}" for c, gi in zip(cidx, g // 23)],
    })


def gen_transcripts() -> pd.DataFrame:
    """RefSeq-shaped transcript store: one transcript per gene region,
    NM_ (coding) for 2 of 3, NR_ (non-coding) otherwise, alternating strand
    — the index side of the reference's transcript lookup
    (howard/objects/variants.py:7821-8202). sf-independent broadcast side;
    SQL twin is TX_SQL."""
    reg = gen_regions()
    g = np.arange(len(reg), dtype=np.int64)
    prefix = np.where(g % 3 == 0, "NR_", "NM_")
    return pd.DataFrame({
        "chrom": reg["chrom"],
        "tx_start": reg["start"],
        "tx_end": reg["end"],
        "tx_id": [f"{p}{i:06d}" for p, i in zip(prefix, g)],
        "strand": np.where(g % 2 == 0, "+", "-"),
    })


# deterministic per-chromosome reference sequence covering the whole vfix
# position domain (pos = 1 + i%2999999): base at (cid, 1-based j) =
# BASES[(j*GA + cid*GB + GC) % 4]. sf-INDEPENDENT, so the parquet twin the
# SQL oracle reads lives at a static path — the stand-in for the FASTA the
# reference's HGVS stage holds per worker (variants.py:7821-8202, :8128).
# covers the variant position domain (pos = 1 + i%2999999) AND the full
# transcript span (max tx_end = 2,900,000 + 5,000 + 195,000 — exons of the
# HGVS model reach past the variant domain)
GENOME_LEN = 3_100_010
GENOME_CONST = (48271, 16807, 7)
GENOME_PATH = os.path.join(tempfile.gettempdir(), "howard_ray_cache",
                           "genome_v3.parquet")


def gen_genome_chrom(cid: int) -> str:
    ga, gb, gc = GENOME_CONST
    j = np.arange(1, GENOME_LEN + 1, dtype=np.int64)
    u = (j * ga + cid * gb + gc) % 4
    return np.array(BASES, dtype="S1")[u].tobytes().decode()


def ensure_genome() -> str:
    """Write the genome parquet twin once (atomic); returns its path."""
    import pyarrow.parquet as pq
    os.makedirs(os.path.dirname(GENOME_PATH), exist_ok=True)
    if not os.path.exists(GENOME_PATH):
        t = pa.table({"chrom": CHROMS,
                      "seq": [gen_genome_chrom(c) for c in range(len(CHROMS))]})
        pq.write_table(t, GENOME_PATH + ".tmp")
        os.replace(GENOME_PATH + ".tmp", GENOME_PATH)
    return GENOME_PATH


# ---------------------------------------------------------------------------
# SQL side (same constants, same structure)
# ---------------------------------------------------------------------------

def _sql_mix(name: str, var: str = "i") -> str:
    a, b, m = CONST[name]
    return f"(({var}*{a}+{b})%{m})"


def _build_vsql() -> str:
    base_list = "['A','C','G','T']"
    sample_raw, sample_final = [], []
    for s in range(1, 5):
        sample_raw.append(
            f"{_sql_mix(f'gt{s}')} AS g{s}, {_sql_mix(f'sdp{s}')} AS sdp{s}, "
            f"{_sql_mix(f'ad0{s}')} AS ad0{s}, {_sql_mix(f'ad1{s}')} AS ad1{s}")
        sample_final.append(
            f"(CASE WHEN g{s}<35 THEN '0/0' WHEN g{s}<65 THEN '0/1' "
            f"WHEN g{s}<85 THEN '1/1' ELSE './.' END)"
            f" || ':' || sdp{s} || ':' || ad0{s} || ',' || ad1{s} AS sample{s}")
    return f"""
  SELECT vidx, chrom, pos, vid, ref, alt, qual, "filter", info, format,
         {', '.join(f'sample{s}' for s in range(1, 5))},
         cover, nci60
  FROM (
    SELECT i AS vidx,
      (CASE WHEN cidx < 22 THEN 'chr' || CAST(cidx+1 AS VARCHAR) ELSE 'chrX' END) AS chrom,
      pos,
      (CASE WHEN vidr < 7 THEN 'rs' || CAST(i AS VARCHAR) ELSE '.' END) AS vid,
      (CASE WHEN r100 >= 5 AND r100 < 10
            THEN ref0 || {base_list}[xb1+1] || {base_list}[xb2+1]
            WHEN r100 < 5 OR (r100 >= 20 AND r100 < 25)
            THEN ref0 || {base_list}[xb1+1] ELSE ref0 END) AS ref,
      (CASE WHEN r100 < 10 THEN ref0
            WHEN r100 >= 15 AND r100 < 20
            THEN ref0 || {base_list}[xb2+1] || {base_list}[xb1+1]
            WHEN r100 >= 10 AND r100 < 20 THEN ref0 || {base_list}[xb2+1]
            WHEN r100 >= 20 AND r100 < 25 THEN alt0 || {base_list}[xb2+1]
            ELSE alt0 END) AS alt,
      q / 100.0 AS qual,
      (CASE WHEN f10 < 8 THEN 'PASS' ELSE 'LowQual' END) AS "filter",
      'NS=' || ns || ';DP=' || dp || ';AA=' || aa || ';MULTI=' || ns || ',' || dp
        || (CASE WHEN cln < 2 THEN ';CLNSIG=pathogenic'
                 WHEN cln < 7 THEN ';CLNSIG=non-pathogenic' ELSE '' END) AS info,
      'GT:DP:AD' AS format,
      {', '.join(sample_final)},
      cover, nci60
    FROM (
      SELECT i,
        (22 - CAST(floor(sqrt({_sql_mix('u_chrom')})) AS BIGINT)) AS cidx,
        1 + {_sql_mix('pos')} AS pos,
        {base_list}[{_sql_mix('refb')}+1] AS ref0,
        {base_list}[(({_sql_mix('refb')} + 1 + {_sql_mix('altoff')})%4)+1] AS alt0,
        {_sql_mix('r100')} AS r100, {_sql_mix('xb1')} AS xb1, {_sql_mix('xb2')} AS xb2,
        {_sql_mix('vidr')} AS vidr, {_sql_mix('q')} AS q, {_sql_mix('f10')} AS f10,
        1 + {_sql_mix('ns')} AS ns, 1 + {_sql_mix('dp')} AS dp,
        {base_list}[{_sql_mix('aab')}+1] AS aa, {_sql_mix('cln')} AS cln,
        {_sql_mix('cover')} AS cover, {_sql_mix('nci60')} / 1000.0 AS nci60,
        {', '.join(sample_raw)}
      FROM (SELECT (l_orderkey*8 + l_linenumber)*{FANOUT} + k.range AS i
            FROM lineitem, range({FANOUT}) k)
    )
  )
"""


# `WITH v AS ({VSQL})` prefix for every oracle over the fixture; extra
# helper columns (vidx, cover, nci60) are projected away by each query.
VSQL = _build_vsql()
V_WITH = f"WITH v AS ({VSQL})"

# region store twin
_ga, _gb, _gm = GENE_CONST["gstart"]
_la, _lb, _lm = GENE_CONST["glen"]
REGIONS_SQL = f"""
  SELECT (CASE WHEN g%23 < 22 THEN 'chr' || CAST(g%23+1 AS VARCHAR) ELSE 'chrX' END) AS chrom,
         1 + (g*{_ga}+{_gb})%{_gm} AS start,
         1 + (g*{_ga}+{_gb})%{_gm} + 5000 + (g*{_la}+{_lb})%{_lm} AS "end",
         'GENE_' || (CASE WHEN g%23 < 22 THEN 'chr' || CAST(g%23+1 AS VARCHAR) ELSE 'chrX' END)
                 || '_' || CAST(g//23 AS VARCHAR) AS gene
  FROM (SELECT range AS g FROM range({N_GENES}))
"""

# transcript store twin (gen_transcripts)
TX_SQL = f"""
  SELECT (CASE WHEN g%23 < 22 THEN 'chr' || CAST(g%23+1 AS VARCHAR) ELSE 'chrX' END) AS chrom,
         1 + (g*{_ga}+{_gb})%{_gm} AS tx_start,
         1 + (g*{_ga}+{_gb})%{_gm} + 5000 + (g*{_la}+{_lb})%{_lm} AS tx_end,
         (CASE WHEN g%3 = 0 THEN 'NR_' ELSE 'NM_' END) || lpad(CAST(g AS VARCHAR), 6, '0') AS tx_id,
         (CASE WHEN g%2 = 0 THEN '+' ELSE '-' END) AS strand
  FROM (SELECT range AS g FROM range({N_GENES}))
"""
