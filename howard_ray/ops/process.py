"""The composite `process` pipeline — the reference's flagship entry point
(howard process, /root/reference/howard/tools/process.py:25-103: load →
annotation → calculation → prioritization → export) as ONE streaming Ray
Data pipeline over the variants fixture.

Stages (all fused into per-batch passes; the broadcast annotation store is
the only cross-stage state):
  1. explode INFO keys to typed columns        (variants.py:1771-1986)
  2. exact annotation join, broadcast store    (variants.py:5845-6428)
  3. VARTYPE calculation                       (calculations_config.json)
  4. prioritization scoring (rule engine)      (variants.py:7073-7815)
  5. pack computed fields back into INFO       (variants.py:7716-7797)

Unlike the reference — which runs these as sequential whole-table SQL UPDATE
passes — every row flows through all five stages in a single map over
streaming Arrow batches: no intermediate materialization, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .variants import (
    ANN_VARIANTS_PATH,
    VARIANTS_PATH,
    _variants_ds,
    _vartype_arr,
    ensure_fixtures,
    explode_batch,
)

SQL: dict[str, str] = {}


def process_pipeline(sf_dir: str):
    ensure_fixtures()
    import pyarrow.parquet as pq

    ann = pq.read_table(ANN_VARIANTS_PATH).to_pandas()
    key = (ann["chrom"] + "_" + ann["pos"].astype(str) + "_"
           + ann["ref"] + "_" + ann["alt"])
    lookup_ref = ray.put(dict(zip(key, ann["nci60"])))

    class Process:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)  # annotation store, per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            # 1. explode
            t = explode_batch(batch)
            df = t.to_pandas()
            # 2. annotate (broadcast exact join)
            k = (df["chrom"] + "_" + df["pos"].astype(str) + "_"
                 + df["ref"] + "_" + df["alt"])
            df["nci60"] = k.map(self.lookup)
            # 3. calculate VARTYPE
            df["vartype"] = np.asarray(_vartype_arr(batch))
            # 4. prioritize: DP>=100 → +2, CLNSIG=pathogenic → +5,
            #    nci60>0.5 → +1; flag = FILTER == PASS
            score = (np.where(df["info_DP"] >= 100, 2, 0)
                     + np.where(df["info_CLNSIG"] == "pathogenic", 5, 0)
                     + np.where(df["nci60"].fillna(0) > 0.5, 1, 0))
            flag = (batch["filter"].to_pandas() == "PASS").astype("int64")
            df["pzscore"] = score.astype("int64")
            df["pzflag"] = flag
            # 5. pack computed fields back into INFO
            nci = df["nci60"].map(lambda x: f";nci60={x:.3f}" if pd.notna(x) else "")
            df["info_out"] = (df["info"] + nci
                              + ";VARTYPE=" + df["vartype"]
                              + ";PZScore=" + df["pzscore"].astype(str)
                              + ";PZFlag=" + df["pzflag"].astype(str))
            out = df[["chrom", "pos", "ref", "alt", "vartype",
                      "pzscore", "pzflag", "info_out"]].copy()
            return pa.Table.from_pandas(out, preserve_index=False)

    ds = _variants_ds(["chrom", "pos", "ref", "alt", "filter", "info"])
    out = (ds.map_batches(Process, batch_format="pyarrow", concurrency=(1, 4))
           .to_pandas())
    return out.sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)


SQL["process_pipeline"] = f"""
WITH exploded AS (
  SELECT chrom, pos, ref, alt, "filter", info,
         CAST(regexp_extract(';' || info, ';DP=([^;]*)', 1) AS BIGINT) AS dp,
         nullif(regexp_extract(';' || info, ';CLNSIG=([^;]*)', 1), '') AS clnsig,
         CASE WHEN length(ref) = 1 AND length(alt) = 1 THEN 'SNV'
              WHEN length(ref) != length(alt) THEN 'INDEL'
              ELSE 'MNV' END AS vartype
  FROM '{VARIANTS_PATH}'),
annotated AS (
  SELECT e.*, a.nci60
  FROM exploded e
  LEFT JOIN '{ANN_VARIANTS_PATH}' a
    ON e.chrom = a.chrom AND e.pos = a.pos AND e.ref = a.ref AND e.alt = a.alt),
scored AS (
  SELECT *,
         (CASE WHEN dp >= 100 THEN 2 ELSE 0 END
          + CASE WHEN clnsig = 'pathogenic' THEN 5 ELSE 0 END
          + CASE WHEN COALESCE(nci60, 0) > 0.5 THEN 1 ELSE 0 END) AS pzscore,
         CASE WHEN "filter" = 'PASS' THEN 1 ELSE 0 END AS pzflag
  FROM annotated)
SELECT chrom, pos, ref, alt, vartype, pzscore, pzflag,
       info
       || CASE WHEN nci60 IS NOT NULL
               THEN ';nci60=' || format('{{:.3f}}', nci60) ELSE '' END
       || ';VARTYPE=' || vartype
       || ';PZScore=' || CAST(pzscore AS VARCHAR)
       || ';PZFlag=' || CAST(pzflag AS VARCHAR) AS info_out
FROM scored
ORDER BY chrom, pos, ref, alt
"""
