"""VCF format surface: header parse/reconstruct, ``.hdr`` sidecar, and
``.vcf[.gz]`` read/write on Ray Data.

Reference behaviors re-expressed (all file:line in /root/reference):
- in-file ``##`` header parse into a typed schema object
  (howard/objects/variants.py:383-483; sidecar ``.hdr`` at :428-430)
- INFO/FORMAT fields typed Integer|Float|String|Flag with arity Number;
  any ``Number != 1`` degrades to string (variants.py:1889-1891)
- body read as TSV with forced core types (database.py:72-83)
- VCF export: reconstructed header + ordered body; ``.gz`` output is real
  BGZF framing (what bgzip produces — SAMv1 §4.1 gzip members + EOF
  marker) with a chrom→virtual-offset linear index sidecar enabling
  ``read_vcf_region`` seeks (variants.py:2446-2546; the tabix binning
  index proper is replaced by the linear index — no htslib in scope)
- header sidecar writer in VCF-header format (variants.py:2351-2444)

Ray-Data mapping: the body is a block-parallel ``read_csv`` (tab-separated,
header lines skipped via byte-counted ``skip_rows``); ``.gz`` inputs decode
through Arrow's gzip stream (single-threaded per file, like the reference —
shard large corpora into a directory of per-chromosome files for
parallelism, which ``write_vcf(..., shard_by_chrom=True)`` produces).
"""

from __future__ import annotations

import gzip
import io
import json
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

CORE_COLS = ["chrom", "pos", "vid", "ref", "alt", "qual", "filter", "info"]
VCF_CORE_HEADER = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO"]

_STRUCT_RE = re.compile(
    r'##(?P<kind>INFO|FORMAT)=<ID=(?P<id>[^,>]+),Number=(?P<num>[^,>]+),'
    r'Type=(?P<type>[^,>]+)(?:,Description="(?P<desc>[^"]*)")?[^>]*>')

# reference code_type_map (variants.py:193-200): Number!=1 -> VARCHAR
VCF_TYPE_TO_ARROW = {"Integer": pa.int64(), "Float": pa.float64(),
                     "String": pa.string(), "Flag": pa.bool_(),
                     "Character": pa.string()}


class VCFHeader:
    """Parsed ``##`` metadata: typed INFO/FORMAT declarations plus the raw
    line list for lossless reconstruction."""

    def __init__(self):
        self.fileformat = "VCFv4.2"
        self.infos: dict[str, dict] = {}    # id -> {number, type, desc}
        self.formats: dict[str, dict] = {}
        self.raw_lines: list[str] = []      # every ## line, original order
        self.samples: list[str] = []

    @classmethod
    def parse(cls, lines: list[str]) -> "VCFHeader":
        h = cls()
        for line in lines:
            line = line.rstrip("\n")
            if line.startswith("##"):
                h.raw_lines.append(line)
                if line.startswith("##fileformat="):
                    h.fileformat = line.split("=", 1)[1]
                m = _STRUCT_RE.match(line)
                if m:
                    d = {"number": m.group("num"), "type": m.group("type"),
                         "desc": m.group("desc") or ""}
                    (h.infos if m.group("kind") == "INFO" else h.formats)[
                        m.group("id")] = d
            elif line.startswith("#CHROM"):
                cols = line.split("\t")
                if len(cols) > 9:
                    h.samples = cols[9:]
        return h

    def info_arrow_type(self, key: str) -> pa.DataType:
        """INFO key -> Arrow type; Number != 1 degrades to string
        (reference variants.py:1889-1891)."""
        d = self.infos.get(key)
        if d is None:
            return pa.string()
        if d["number"] != "1":
            return pa.string()
        return VCF_TYPE_TO_ARROW.get(d["type"], pa.string())

    def add_info(self, id: str, number: str, type: str, desc: str) -> None:
        self.infos[id] = {"number": number, "type": type, "desc": desc}
        self.raw_lines.append(
            f'##INFO=<ID={id},Number={number},Type={type},Description="{desc}">')

    def add_format(self, id: str, number: str, type: str, desc: str) -> None:
        self.formats[id] = {"number": number, "type": type, "desc": desc}
        self.raw_lines.append(
            f'##FORMAT=<ID={id},Number={number},Type={type},Description="{desc}">')

    def add_raw(self, line: str) -> None:
        self.raw_lines.append(line)

    def to_lines(self) -> list[str]:
        lines = list(self.raw_lines)
        if not any(l.startswith("##fileformat=") for l in lines):
            lines.insert(0, f"##fileformat={self.fileformat}")
        cols = list(VCF_CORE_HEADER)
        if self.samples:
            cols += ["FORMAT"] + self.samples
        lines.append("\t".join(cols))
        return lines


class BGZFWriter:
    """Blocked-gzip (BGZF) writer — the framing ``bgzip`` produces and the
    reference emits for ``.vcf.gz`` (functions/commons.py:2274-2415): a
    stream of independent <=64 KiB gzip members, each carrying the BC extra
    subfield with its compressed size, terminated by the 28-byte EOF
    marker. Readable by plain ``gzip`` (concatenated members) AND
    block-seekable by htslib-style virtual offsets — which is what makes
    the format tabix-indexable, unlike a monolithic gzip stream.

    Format is the public SAM/BGZF spec (samtools/hts-specs SAMv1 §4.1)."""

    MAX_BLOCK = 65280  # uncompressed payload per block (bgzip's default)
    EOF_MARKER = bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000")

    def __init__(self, raw):
        self.raw = raw
        self.buf = bytearray()
        self.block_starts: list[int] = []   # compressed offset of each block
        self.block_usizes: list[int] = []   # uncompressed payload sizes
        self.coffset = 0

    def write(self, data) -> int:
        self.buf += data.encode() if isinstance(data, str) else data
        while len(self.buf) >= self.MAX_BLOCK:
            self._flush_block(self.buf[:self.MAX_BLOCK])
            del self.buf[:self.MAX_BLOCK]
        return len(data)

    def _flush_block(self, payload: bytes) -> None:
        import zlib
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        deflated = co.compress(payload) + co.flush()
        bsize = len(deflated) + 25 + 1  # header(18) + crc/isize(8) - 1 + 1
        header = (b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
                  + (6).to_bytes(2, "little")          # XLEN
                  + b"BC" + (2).to_bytes(2, "little")  # BC subfield
                  + (bsize - 1).to_bytes(2, "little"))
        trailer = (zlib.crc32(payload).to_bytes(4, "little")
                   + (len(payload) & 0xFFFFFFFF).to_bytes(4, "little"))
        self.block_starts.append(self.coffset)
        self.block_usizes.append(len(payload))
        block = header + deflated + trailer
        self.raw.write(block)
        self.coffset += len(block)

    def close(self) -> None:
        if self.buf:
            self._flush_block(bytes(self.buf))
            self.buf.clear()
        self.raw.write(self.EOF_MARKER)
        self.raw.close()

    def virtual_offset(self, upos: int) -> int:
        """htslib virtual offset (coffset << 16 | within-block offset) for
        an uncompressed stream position — call after close()."""
        import bisect
        ustarts = [0]
        for s in self.block_usizes:
            ustarts.append(ustarts[-1] + s)
        i = bisect.bisect_right(ustarts, upos) - 1
        i = min(i, len(self.block_starts) - 1)
        return (self.block_starts[i] << 16) | (upos - ustarts[i])

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _open_text(path: str):
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="utf-8")
    return open(path, "r", encoding="utf-8")


def _first_vcf_file(path: str) -> str:
    if os.path.isdir(path):
        names = sorted(n for n in os.listdir(path)
                       if n.endswith((".vcf", ".vcf.gz")))
        if not names:
            raise FileNotFoundError(f"no .vcf files under {path}")
        return os.path.join(path, names[0])
    return path


def read_vcf_header(path: str) -> tuple[VCFHeader, int]:
    """Parse the header of a VCF (or the first shard of a directory).
    Returns (header, n_header_lines) — metadata-only, reads just the head
    of one file. A ``<path>.hdr`` sidecar takes precedence for the typed
    declarations (reference variants.py:428-430)."""
    orig = path
    path = _first_vcf_file(path)
    lines: list[str] = []
    with _open_text(path) as f:
        for line in f:
            if line.startswith("#"):
                lines.append(line)
                if line.startswith("#CHROM"):
                    break
            else:
                break
    header = VCFHeader.parse(lines)
    # shard-directory sidecars live NEXT TO the directory ('<dir>.hdr',
    # what write_vcf(shard_by_chrom=True) writes); single-file sidecars
    # next to the file
    for sidecar in (orig.rstrip("/") + ".hdr", path + ".hdr"):
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                side = VCFHeader.parse(f.readlines())
            if side.infos:
                header.infos = side.infos
            if side.formats:
                header.formats = side.formats
            break
    return header, len(lines)


def read_vcf(path: str, columns: list[str] | None = None
             ) -> tuple[ray.data.Dataset, VCFHeader]:
    """VCF -> (Dataset, header). Body columns: chrom pos vid ref alt qual
    filter info [format sample...]; pos int64, qual float64 ('.' -> null),
    everything else string (forced types, reference database.py:72-83)."""
    from pyarrow import csv as pacsv

    header, _ = read_vcf_header(path)
    names = CORE_COLS + (["format"] + header.samples if header.samples else [])

    if os.path.isdir(path):
        paths = [os.path.join(path, n) for n in sorted(os.listdir(path))
                 if n.endswith((".vcf", ".vcf.gz"))]
    else:
        paths = [path]

    # each file owns its header length and compression: group files by
    # (n_header_lines, gz) and read each group with its own options — a
    # mixed directory (externally produced shards, differing ## counts,
    # .vcf next to .vcf.gz) must not inherit the first file's framing
    groups: dict[tuple[int, bool], list[str]] = {}
    for p in paths:
        n_skip = read_vcf_header(p)[1]  # head-of-file read only
        groups.setdefault((n_skip, p.endswith(".gz")), []).append(p)

    parse_opts = pacsv.ParseOptions(delimiter="\t", quote_char=False)
    conv_opts = pacsv.ConvertOptions(
        column_types={"pos": pa.int64(), "qual": pa.string(),
                      **{c: pa.string() for c in names if c != "pos"}})
    ds = None
    for (n_skip, gz), sub in sorted(groups.items()):
        read_opts = pacsv.ReadOptions(column_names=names, skip_rows=n_skip)
        kwargs = {}
        if gz:
            kwargs["arrow_open_stream_args"] = {"compression": "gzip"}
        part = ray.data.read_csv(sub, read_options=read_opts,
                                 parse_options=parse_opts,
                                 convert_options=conv_opts, **kwargs)
        ds = part if ds is None else ds.union(part)

    def typed(batch: pa.Table) -> pa.Table:
        q = batch["qual"]
        q = pc.if_else(pc.equal(q, "."), pa.scalar(None, pa.string()), q)
        return batch.set_column(batch.column_names.index("qual"), "qual",
                                pc.cast(q, pa.float64()))

    ds = ds.map_batches(typed, batch_format="pyarrow")
    if columns:
        ds = ds.select_columns(columns)
    return ds, header


def _body_lines(batch: pa.Table, samples: list[str]) -> list[str]:
    """Format a batch as VCF body lines (vectorized string building).
    Floats use shortest-roundtrip repr; nulls become '.'."""
    cols = []
    for name in CORE_COLS + (["format"] + samples if samples else []):
        arr = batch[name]
        if pa.types.is_floating(arr.type):
            v = arr.to_numpy(zero_copy_only=False)
            s = np.array([("." if x != x else repr(float(x))) for x in v],
                         dtype=object)
        else:
            s = np.asarray(pc.fill_null(pc.cast(arr, pa.string()), ".")
                           .to_numpy(zero_copy_only=False), dtype=object)
        cols.append(s)
    out = cols[0]
    for c in cols[1:]:
        out = np.char.add(np.char.add(out.astype(str), "\t"), c.astype(str))
    return out.tolist()


def write_vcf(ds: ray.data.Dataset, path: str, header: VCFHeader,
              sort: bool = True, shard_by_chrom: bool = False,
              compress_shards: bool = False) -> dict:
    """Dataset -> VCF file (or per-chromosome shard directory), with
    reconstructed header + ``.hdr`` sidecar. ``.gz`` paths gzip-compress.

    Single-file mode streams batches through the driver in sorted order
    (the format is inherently one ordered file, reference
    variants.py:2446-2546); ``shard_by_chrom=True`` writes one body shard
    per chromosome in parallel workers instead — the scale path."""
    hdr_text = "\n".join(header.to_lines()) + "\n"
    if sort and not shard_by_chrom:
        # single-file mode needs the GLOBAL (chrom, pos) order; shard mode
        # sorts within each shard instead — Ray's groupby shuffle orders by
        # the group key only, so a pre-sort's intra-chrom pos order would
        # not be guaranteed to survive the exchange anyway (and the second
        # all-to-all would be wasted work)
        ds = ds.sort(["chrom", "pos"])
    samples = header.samples

    if shard_by_chrom:
        os.makedirs(path, exist_ok=True)

        def write_shard(group: pa.Table) -> pa.Table:
            chrom = group["chrom"][0].as_py()
            if sort:
                group = group.take(pc.sort_indices(group["pos"]))
            ext = ".vcf.gz" if compress_shards else ".vcf"
            shard = os.path.join(path, f"{chrom}{ext}")
            text = hdr_text + "\n".join(_body_lines(group, samples)) + "\n"
            tmp = shard + ".tmp"
            if compress_shards:
                with BGZFWriter(open(tmp, "wb")) as w:
                    w.write(text)
                # per-shard linear index: the one chrom starts right after
                # the header text
                with open(tmp + ".cidx", "w") as jf:
                    json.dump({chrom: w.virtual_offset(
                        len(hdr_text.encode()))}, jf)
                os.replace(tmp + ".cidx", shard + ".cidx.json")
            else:
                with open(tmp, "w") as f:
                    f.write(text)
            os.replace(tmp, shard)
            return pa.table({"chrom": [chrom],
                             "n_rows": pa.array([group.num_rows], pa.int64())})

        stats = (ds.groupby("chrom").map_groups(write_shard,
                                                batch_format="pyarrow")
                 .to_pandas())
        write_hdr_sidecar(path, header)
        if "n_rows" not in stats.columns:  # empty dataset: 0-column frame
            return {"path": path, "shards": 0, "n_rows": 0}
        return {"path": path, "shards": len(stats),
                "n_rows": int(stats["n_rows"].sum())}

    gz = path.endswith(".gz")
    tmp = path + ".tmp"
    n = 0
    raw = open(tmp, "wb")
    f = BGZFWriter(raw) if gz else io.TextIOWrapper(raw, encoding="utf-8")
    upos = len(hdr_text.encode())
    chrom_upos: dict[str, int] = {}   # chrom -> uncompressed start offset
    with f:
        f.write(hdr_text)
        for batch in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=65536):
            lines = _body_lines(batch, samples)
            if gz:
                chroms = batch["chrom"].to_pylist()
                if any(c not in chrom_upos for c in chroms):
                    # few batches contain a chrom's first row (input is
                    # chrom-sorted) — only those pay the per-line encode
                    lens = np.fromiter((len(s.encode()) + 1 for s in lines),
                                       dtype=np.int64, count=len(lines))
                    starts = upos + np.concatenate(([0], np.cumsum(lens)[:-1]))
                    for i, c in enumerate(chroms):
                        if c not in chrom_upos:
                            chrom_upos[c] = int(starts[i])
                chunk = ("\n".join(lines) + "\n").encode()
                f.write(chunk)
                upos += len(chunk)
            else:
                f.write("\n".join(lines) + "\n")
            n += len(lines)
    os.replace(tmp, path)
    write_hdr_sidecar(path, header)
    if gz:
        # linear chrom index over BGZF virtual offsets (the tabix linear-
        # index idea, hts-specs tabix.pdf; enables read_vcf_region seeks)
        idx = {c: f.virtual_offset(u) for c, u in chrom_upos.items()}
        with open(path + ".cidx.json", "w") as jf:
            json.dump(idx, jf)
    return {"path": path, "n_rows": n}


def read_vcf_region(path: str, chrom: str) -> pa.Table:
    """Seek-read one chromosome from an indexed ``.vcf.gz``: jump to the
    chrom's BGZF virtual offset from the ``.cidx.json`` linear index,
    inflate members forward, stop at the first row of the next chrom —
    the reference's sorted+tabix-indexed region query shape
    (variants.py:2446-2546) without scanning the file."""
    import zlib

    header, _ = read_vcf_header(path)
    names = CORE_COLS + (["format"] + header.samples if header.samples else [])
    with open(path + ".cidx.json") as f:
        idx = json.load(f)
    # typed empty: the non-empty path emits pos=int64 / qual=float64, and
    # a string-typed empty breaks concat with non-empty region tables
    empty = pa.table({n: pa.array([], pa.int64() if n == "pos"
                                  else pa.float64() if n == "qual"
                                  else pa.string()) for n in names})
    if chrom not in idx:
        return empty
    voff = int(idx[chrom])
    coff, uoff = voff >> 16, voff & 0xFFFF
    want = chrom.encode() + b"\t"
    kept: list[bytes] = []
    with open(path, "rb") as fh:
        fh.seek(coff)
        buf = b""
        first = True
        done = False
        while not done:
            head = fh.read(18)
            if len(head) < 18 or head[:4] != b"\x1f\x8b\x08\x04":
                break
            bsize = int.from_bytes(head[16:18], "little") + 1
            rest = fh.read(bsize - 18)
            payload = zlib.decompress(rest[:-8], -15)
            if not payload:        # EOF marker member
                break
            if first:
                payload = payload[uoff:]
                first = False
            buf += payload
            *complete, buf = buf.split(b"\n")
            for line in complete:
                if not line.startswith(want):
                    done = True
                    break
                kept.append(line)
    if buf and not done and buf.startswith(want):
        # final line without a trailing newline — salvage it whether or
        # not earlier lines were kept (the old `not kept` guard dropped
        # the LAST row of the last chrom in no-trailing-newline files)
        kept.append(buf)
    if not kept:
        return empty
    from pyarrow import csv as pacsv
    data = b"\n".join(kept) + b"\n"
    tbl = pacsv.read_csv(
        pa.BufferReader(data),
        read_options=pacsv.ReadOptions(column_names=names),
        parse_options=pacsv.ParseOptions(delimiter="\t", quote_char=False),
        convert_options=pacsv.ConvertOptions(
            column_types={"pos": pa.int64(),
                          **{c: pa.string() for c in names if c != "pos"}}))
    q = tbl["qual"]
    q = pc.if_else(pc.equal(q, "."), pa.scalar(None, pa.string()), q)
    return tbl.set_column(tbl.column_names.index("qual"), "qual",
                          pc.cast(q, pa.float64()))


def write_hdr_sidecar(path: str, header: VCFHeader) -> str:
    """VCF-header-format ``.hdr`` sidecar (reference variants.py:2351-2444)."""
    sidecar = path.rstrip("/") + ".hdr"
    with open(sidecar, "w") as f:
        f.write("\n".join(header.to_lines()) + "\n")
    return sidecar


def fixture_header() -> VCFHeader:
    """Header describing the vfix fixture's INFO/FORMAT sub-schema."""
    h = VCFHeader()
    h.add_raw("##fileformat=VCFv4.2")
    h.add_info("NS", "1", "Integer", "Number of Samples With Data")
    h.add_info("DP", "1", "Integer", "Total Depth")
    h.add_info("AA", "1", "String", "Ancestral Allele")
    h.add_info("MULTI", "2", "Integer", "Two packed integers (Number=2)")
    h.add_info("CLNSIG", "1", "String", "Clinical significance")
    h.add_format("GT", "1", "String", "Genotype")
    h.add_format("DP", "1", "Integer", "Read Depth")
    h.add_format("AD", "2", "Integer", "Allelic Depth")
    h.samples = ["sample1", "sample2", "sample3", "sample4"]
    return h
