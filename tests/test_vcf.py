"""VCF surface: header parse/reconstruct, read/write round-trip, sharded
write, header-driven typing, and the vfix numpy-vs-SQL twin equality."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from howard_ray.ops import vfix
from howard_ray.vcf import (VCFHeader, fixture_header, read_vcf,
                            read_vcf_header, write_vcf)

REF_VCF = "/root/reference/tests/data/example.vcf"
SF = "/root/testdata/sf0.001"


def test_vfix_numpy_matches_sql_twin():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    sql_df = con.execute(
        f"{vfix.V_WITH} SELECT * FROM v ORDER BY vidx").fetchdf()
    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_orderkey", "l_linenumber"])
    py = (vfix.gen_variants_batch(t).to_pandas()
          .sort_values("vidx").reset_index(drop=True))
    assert len(sql_df) == len(py) == t.num_rows * vfix.FANOUT
    for c in py.columns:
        a, b = py[c], sql_df[c]
        if a.dtype.kind == "f":
            assert (a - b).abs().max() < 1e-12, c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c


@pytest.mark.skipif(not os.path.exists(REF_VCF), reason="reference absent")
def test_parse_reference_example_vcf_header():
    header, n_skip = read_vcf_header(REF_VCF)
    assert header.fileformat == "VCFv4.1"
    assert header.infos["NS"] == {"number": "1", "type": "Integer",
                                  "desc": "Number of Samples With Data"}
    assert header.info_arrow_type("NS") == pa.int64()
    assert header.info_arrow_type("AA") == pa.string()
    # FORMAT HQ has Number=2
    assert header.formats["HQ"]["number"] == "2"
    assert header.samples == ["sample1", "sample2", "sample3", "sample4"]
    assert n_skip > 10


@pytest.mark.skipif(not os.path.exists(REF_VCF), reason="reference absent")
def test_read_reference_example_vcf_body(ray_session):
    ds, header = read_vcf(REF_VCF)
    df = ds.to_pandas()
    assert len(df) == 7  # example.vcf body rows
    assert set(df.columns) == {"chrom", "pos", "vid", "ref", "alt", "qual",
                               "filter", "info", "format", "sample1",
                               "sample2", "sample3", "sample4"}
    assert df["pos"].dtype.kind == "i"
    assert df["qual"].dtype.kind == "f"


def test_vcf_write_read_roundtrip_gz(ray_session, tmp_path):
    import ray.data
    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_orderkey", "l_linenumber"]).slice(0, 250)
    body = vfix.gen_variants_batch(t).drop_columns(["vidx"])
    path = str(tmp_path / "rt.vcf.gz")
    info = write_vcf(ray.data.from_arrow(body), path, fixture_header())
    assert info["n_rows"] == body.num_rows == 250 * vfix.FANOUT
    assert os.path.exists(path + ".hdr")
    ds, header = read_vcf(path)
    back = ds.to_pandas().sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)
    orig = body.to_pandas().sort_values(["chrom", "pos", "ref", "alt"]).reset_index(drop=True)
    assert back.equals(orig[back.columns])
    # header round-trips the typed declarations
    assert header.infos.keys() == fixture_header().infos.keys()
    assert header.info_arrow_type("MULTI") == pa.string()  # Number=2 degrades


def test_vcf_sharded_write_and_dir_read(ray_session, tmp_path):
    import ray.data
    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_orderkey", "l_linenumber"]).slice(0, 250)
    body = vfix.gen_variants_batch(t).drop_columns(["vidx"])
    out = str(tmp_path / "sharded")
    info = write_vcf(ray.data.from_arrow(body), out, fixture_header(),
                     shard_by_chrom=True)
    assert info["shards"] == body.to_pandas()["chrom"].nunique()
    assert info["n_rows"] == body.num_rows
    ds, _ = read_vcf(out)
    assert ds.count() == body.num_rows
    # read_any dispatches a .vcf directory too
    from howard_ray.sources import read_any
    assert read_any(out).count() == body.num_rows
    # BGZF-compressed shards (the scale path a multi-node writer uses):
    # parallel per-chrom .vcf.gz with per-shard linear indexes
    out_gz = str(tmp_path / "sharded_gz")
    info_gz = write_vcf(ray.data.from_arrow(body), out_gz, fixture_header(),
                        shard_by_chrom=True, compress_shards=True)
    assert info_gz["n_rows"] == body.num_rows
    shards = [n for n in os.listdir(out_gz) if n.endswith(".vcf.gz")]
    assert len(shards) == info_gz["shards"]
    assert all(os.path.exists(os.path.join(out_gz, n + ".cidx.json"))
               for n in shards)
    ds_gz, _ = read_vcf(out_gz)
    assert ds_gz.count() == body.num_rows
    from howard_ray.vcf import read_vcf_region
    chrom = shards[0][:-len(".vcf.gz")]
    reg = read_vcf_region(os.path.join(out_gz, shards[0]), chrom)
    exp = body.to_pandas()
    assert reg.num_rows == (exp["chrom"] == chrom).sum()


def test_bgzf_framing(tmp_path):
    """.vcf.gz output is real BGZF (SAMv1 §4.1): every gzip member carries
    the BC extra subfield with its compressed size, the stream ends with
    the standard 28-byte EOF marker, and each block decompresses
    independently (the property tabix virtual offsets rely on)."""
    import zlib

    from howard_ray.vcf import BGZFWriter

    p = str(tmp_path / "x.bin")
    payload = b"line-%d\n" * 1 % 0 + bytes(200_000)  # force multiple blocks
    with BGZFWriter(open(p, "wb")) as w:
        w.write(payload)
    raw = open(p, "rb").read()
    assert raw.endswith(BGZFWriter.EOF_MARKER)
    # walk the members via their self-declared BSIZE
    off, out, blocks = 0, b"", 0
    while off < len(raw) - len(BGZFWriter.EOF_MARKER):
        assert raw[off:off + 4] == b"\x1f\x8b\x08\x04"
        assert raw[off + 12:off + 14] == b"BC"
        bsize = int.from_bytes(raw[off + 16:off + 18], "little") + 1
        member = raw[off:off + bsize]
        body = zlib.decompress(member[18:-8], -15)  # independent inflate
        assert zlib.crc32(body) == int.from_bytes(member[-8:-4], "little")
        assert len(body) <= BGZFWriter.MAX_BLOCK
        out += body
        off += bsize
        blocks += 1
    assert out == payload and blocks >= 3
    # plain gzip reads the concatenated members transparently
    import gzip
    assert gzip.open(p, "rb").read() == payload


def test_vcf_region_seek_read(ray_session, tmp_path):
    """The .cidx.json linear index + BGZF virtual offsets let a region
    query inflate only from the target chrom's block."""
    import ray.data

    from howard_ray.vcf import read_vcf_region

    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_orderkey", "l_linenumber"]).slice(0, 400)
    body = vfix.gen_variants_batch(t).drop_columns(["vidx"])
    path = str(tmp_path / "r.vcf.gz")
    write_vcf(ray.data.from_arrow(body), path, fixture_header())
    assert os.path.exists(path + ".cidx.json")
    df = body.to_pandas()
    for chrom in sorted(df["chrom"].unique()):
        got = read_vcf_region(path, chrom).to_pandas()
        exp = (df[df["chrom"] == chrom]
               .sort_values(["pos", "ref", "alt"]).reset_index(drop=True))
        got = got.sort_values(["pos", "ref", "alt"]).reset_index(drop=True)
        assert len(got) == len(exp), chrom
        assert (got["pos"].to_numpy() == exp["pos"].to_numpy()).all()
        assert (got["info"] == exp["info"]).all()
    assert read_vcf_region(path, "chrNOPE").num_rows == 0


def test_hdr_sidecar_overrides_inferred_schema(tmp_path):
    # a sidecar with declarations takes precedence (reference
    # variants.py:428-430)
    p = str(tmp_path / "x.vcf")
    with open(p, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                "chr1\t1\t.\tA\tC\t1.0\tPASS\tK=5\n")
    h = VCFHeader()
    h.add_info("K", "1", "Integer", "test")
    with open(p + ".hdr", "w") as f:
        f.write("\n".join(h.to_lines()) + "\n")
    header, _ = read_vcf_header(p)
    assert header.info_arrow_type("K") == pa.int64()


def test_vcf_mixed_directory_read(ray_session, tmp_path):
    """A directory whose shards differ in header-line count AND compression
    must read correctly: each file group gets its own skip_rows/gzip
    framing (regression: first file's framing was applied to all)."""
    import ray.data
    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_orderkey", "l_linenumber"]).slice(0, 120)
    body = vfix.gen_variants_batch(t).drop_columns(["vidx"])
    df = body.to_pandas()
    chroms = sorted(df["chrom"].unique())
    assert len(chroms) >= 2
    d = tmp_path / "mixed"
    d.mkdir()
    # shard 0: plain vcf with the standard header
    h = fixture_header()
    part0 = body.filter(pa.compute.equal(body["chrom"], chroms[0]))
    write_vcf(ray.data.from_arrow(part0), str(d / f"{chroms[0]}.vcf"), h,
              sort=True)
    # shard 1: EXTRA header lines and gzip compression
    h2 = fixture_header()
    h2.add_raw("##extra=one")
    h2.add_raw("##extra=two")
    rest = body.filter(pa.compute.not_equal(body["chrom"], chroms[0]))
    write_vcf(ray.data.from_arrow(rest), str(d / "rest.vcf.gz"), h2,
              sort=True)
    ds, _ = read_vcf(str(d))
    assert ds.count() == body.num_rows
    got = ds.to_pandas().sort_values(["chrom", "pos", "vid"]).reset_index(drop=True)
    exp = df.sort_values(["chrom", "pos", "vid"]).reset_index(drop=True)
    assert list(got["pos"]) == list(exp["pos"])


def test_shard_dir_hdr_sidecar_read_back(ray_session, tmp_path):
    """The '<dir>.hdr' sidecar written by shard-mode write_vcf must drive
    read_vcf_header for the directory (regression: it was never found)."""
    import ray.data
    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_orderkey", "l_linenumber"]).slice(0, 60)
    body = vfix.gen_variants_batch(t).drop_columns(["vidx"])
    out = str(tmp_path / "sharded")
    write_vcf(ray.data.from_arrow(body), out, fixture_header(),
              shard_by_chrom=True)
    # retype one INFO field in the sidecar only
    txt = open(out + ".hdr").read().replace(
        'ID=DP,Number=1,Type=Integer', 'ID=DP,Number=1,Type=Float')
    with open(out + ".hdr", "w") as f:
        f.write(txt)
    hdr, _ = read_vcf_header(out)
    assert hdr.infos["DP"]["type"] == "Float"
