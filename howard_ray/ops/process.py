"""The composite `process` pipeline — the reference's flagship entry point
(howard process, /root/reference/howard/tools/process.py:25-103: load →
annotation → calculation → prioritization → export) as ONE streaming Ray
Data pipeline over the sf-scaled vfix variants fixture.

Stages (all fused into per-batch passes — no cross-stage state at all:
the annotation store values are the closed-form cover/nci60 columns, so
the exact-join stage degenerates to a per-row derivation here; the real
distributed-join shape is exercised by annotate_exact):
  1. explode INFO keys to typed columns        (variants.py:1771-1986)
  2. exact annotation (store membership)       (variants.py:5845-6428)
  3. VARTYPE calculation                       (calculations_config.json)
  4. prioritization scoring (rule engine)      (variants.py:7073-7815)
  5. pack computed fields back into INFO       (variants.py:7716-7797)

Unlike the reference — which runs these as sequential whole-table SQL UPDATE
passes — every row flows through all five stages in a single map over
streaming Arrow batches: no intermediate materialization, no shuffle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .variants import _vartype_arr, explode_batch
from .vfix import V_WITH, ann_cols, variants_ds

SQL: dict[str, str] = {}


def process_pipeline(sf_dir: str):
    def process(batch: pa.Table) -> pa.Table:
        # 1. explode
        t = explode_batch(batch)
        df = t.to_pandas()
        # 2. annotate (closed-form store membership per vidx)
        cover, nci = ann_cols(batch["vidx"].to_numpy())
        hit = cover < 6
        # 3. calculate VARTYPE
        df["vartype"] = np.asarray(_vartype_arr(batch))
        # 4. prioritize: DP>=100 → +2, CLNSIG=pathogenic → +5,
        #    nci60>0.5 → +1; flag = FILTER == PASS
        score = (np.where(df["info_DP"] >= 100, 2, 0)
                 + np.where(df["info_CLNSIG"] == "pathogenic", 5, 0)
                 + np.where(hit & (nci > 0.5), 1, 0))
        flag = (batch["filter"].to_pandas() == "PASS").astype("int64")
        df["pzscore"] = score.astype("int64")
        df["pzflag"] = flag
        # 5. pack computed fields back into INFO
        nci_k = np.round(nci * 1000).astype(np.int64)
        nci_s = np.where(
            hit,
            np.char.add(";nci60=0.", np.char.zfill(nci_k.astype("U3"), 3)),
            "")
        df["info_out"] = (df["info"] + nci_s
                          + ";VARTYPE=" + df["vartype"]
                          + ";PZScore=" + df["pzscore"].astype(str)
                          + ";PZFlag=" + df["pzflag"].astype(str))
        out = df[["chrom", "pos", "ref", "alt", "vartype",
                  "pzscore", "pzflag", "info_out"]].copy()
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = variants_ds(sf_dir, ["vidx", "chrom", "pos", "ref", "alt",
                              "filter", "info"])
    out = (ds.map_batches(process, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)


SQL["process_pipeline"] = f"""{V_WITH},
exploded AS (
  SELECT chrom, pos, ref, alt, "filter", info, cover, nci60,
         CAST(regexp_extract(';' || info, ';DP=([^;]*)', 1) AS BIGINT) AS dp,
         nullif(regexp_extract(';' || info, ';CLNSIG=([^;]*)', 1), '') AS clnsig,
         CASE WHEN length(ref) = 1 AND length(alt) = 1 THEN 'SNV'
              WHEN length(ref) != length(alt) THEN 'INDEL'
              ELSE 'MNV' END AS vartype
  FROM v),
scored AS (
  SELECT *,
         (CASE WHEN dp >= 100 THEN 2 ELSE 0 END
          + CASE WHEN clnsig = 'pathogenic' THEN 5 ELSE 0 END
          + CASE WHEN cover < 6 AND nci60 > 0.5 THEN 1 ELSE 0 END) AS pzscore,
         CASE WHEN "filter" = 'PASS' THEN 1 ELSE 0 END AS pzflag
  FROM exploded)
SELECT chrom, pos, ref, alt, vartype, pzscore, pzflag,
       info
       || CASE WHEN cover < 6
               THEN ';nci60=' || format('{{:.3f}}', nci60) ELSE '' END
       || ';VARTYPE=' || vartype
       || ';PZScore=' || CAST(pzscore AS VARCHAR)
       || ';PZFlag=' || CAST(pzflag AS VARCHAR) AS info_out
FROM scored
ORDER BY chrom, pos, ref, alt
"""
