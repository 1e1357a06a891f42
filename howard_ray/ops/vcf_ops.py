"""VCF-surface operators over the sf-scaled fixture (vfix): write the
fixture as a real ``.vcf.gz`` + ``.hdr`` sidecar, read it back
block-parallel, and drive ``explode_infos`` from the parsed header's key
set instead of a hard-coded list.

Reference parity targets (file:line under /root/reference):
- vcf round-trip: in-file header parse + TSV body with forced types
  (howard/objects/variants.py:383-483) and VCF export with reconstructed
  header (variants.py:2446-2546) — the reference's own test shape
  (tests/test_objects_variants.py VCF fixtures).
- header-driven explode: INFO key set and types inferred from the header,
  with Number!=1 fields degrading to string (variants.py:1889-1929).
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc

from ..vcf import fixture_header, read_vcf, read_vcf_header, write_vcf
from .vfix import V_WITH, variants_ds

SQL: dict[str, str] = {}

CACHE = os.path.join(tempfile.gettempdir(), "howard_ray_cache")

_BODY_COLS = ["chrom", "pos", "vid", "ref", "alt", "qual", "filter", "info",
              "format", "sample1", "sample2", "sample3", "sample4"]


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def ensure_vcf(sf_dir: str) -> str:
    """Write the sf-scaled fixture as a gzip VCF (+.hdr) once per sf."""
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"variants_v3_{_sf_name(sf_dir)}.vcf.gz")
    # regenerate pre-BGZF caches that lack the linear-index sidecar
    if not os.path.exists(path) or not os.path.exists(path + ".cidx.json"):
        ds = variants_ds(sf_dir, columns=_BODY_COLS)
        write_vcf(ds, path, fixture_header(), sort=True)
    return path


def vcf_roundtrip(sf_dir: str):
    """fixture -> write .vcf.gz -> block-parallel re-read -> full body.
    The oracle recomputes the same rows from the closed-form CTE, so any
    header/body formatting or type-forcing error breaks the value hash."""
    path = ensure_vcf(sf_dir)
    ds, header = read_vcf(path)
    assert header.samples == ["sample1", "sample2", "sample3", "sample4"]
    out = ds.to_pandas()
    return out.sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)


SQL["vcf_roundtrip"] = f"""
{V_WITH}
SELECT {", ".join(_BODY_COLS)} FROM v
ORDER BY chrom, pos, ref, alt
"""


def vcf_region(sf_dir: str):
    """Indexed region query: seek straight to chr1's BGZF virtual offset
    via the ``.cidx.json`` linear index and inflate only its blocks — the
    reference's sorted+tabix-indexed access shape (variants.py:2446-2546)
    as a point lookup, not a scan."""
    from ..vcf import read_vcf_region

    path = ensure_vcf(sf_dir)
    out = read_vcf_region(path, "chr1").to_pandas()
    return out.sort_values(["pos", "ref", "alt"]).reset_index(drop=True)


SQL["vcf_region"] = f"""
{V_WITH}
SELECT {", ".join(_BODY_COLS)} FROM v WHERE chrom = 'chr1'
ORDER BY pos, ref, alt
"""


def explode_infos_hdr(sf_dir: str):
    """Header-driven explode_infos: the INFO key set and per-key types come
    from the parsed ``.hdr``/in-file header — NS/DP Integer(1) -> int64,
    AA/CLNSIG String -> string, MULTI Integer Number=2 -> DEGRADES to
    string (reference variants.py:1889-1891). No hard-coded key list."""
    path = ensure_vcf(sf_dir)
    ds, header = read_vcf(path, columns=["chrom", "pos", "ref", "alt", "info"])
    keys = [(k, header.info_arrow_type(k)) for k in header.infos]

    def explode(batch: pa.Table) -> pa.Table:
        padded = pc.binary_join_element_wise(pa.scalar(";"), batch["info"], "")
        out = {c: batch[c] for c in ("chrom", "pos", "ref", "alt")}
        for key, typ in keys:
            ext = pc.extract_regex(padded, f";{key}=(?P<v>[^;]*)")
            v = pc.struct_field(ext, "v")
            out[f"info_{key}"] = v if typ == pa.string() else pc.cast(v, typ)
        return pa.table(out)

    out = ds.map_batches(explode, batch_format="pyarrow").to_pandas()
    return out.sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)


SQL["explode_infos_hdr"] = f"""
{V_WITH}
SELECT chrom, pos, ref, alt,
       CAST(regexp_extract(';' || info, ';NS=([^;]*)', 1) AS BIGINT) AS info_NS,
       CAST(regexp_extract(';' || info, ';DP=([^;]*)', 1) AS BIGINT) AS info_DP,
       regexp_extract(';' || info, ';AA=([^;]*)', 1) AS info_AA,
       regexp_extract(';' || info, ';MULTI=([^;]*)', 1) AS info_MULTI,
       nullif(regexp_extract(';' || info, ';CLNSIG=([^;]*)', 1), '') AS info_CLNSIG
FROM v
ORDER BY chrom, pos, ref, alt
"""
