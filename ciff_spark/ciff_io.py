"""CIFF file interop: read/write the reference's exchange format directly.

A CIFF file is a sequence of varint-length-delimited proto3 messages — one
Header, ``num_postings_lists`` PostingsLists, ``num_docs`` DocRecords
(/root/reference/proto/common-index-format-v1.proto:3-7). Field numbers and
semantics are taken from that public .proto; the wire format is the public
protobuf spec. We hand-roll the codec (protobuf isn't a declared dependency)
— proto3 scalar/string/message fields over varint/fixed64 wire types are
~100 lines.

Semantics honored (cited from the reference implementation):
- posting docids are delta-gaps: first absolute, later ones gaps
  (/root/reference/src/lib.rs:664-672; prefix-sum decode at src/lib.rs:252-259);
- DocRecords must be dense 0..N-1 in order (/root/reference/src/lib.rs:545-547);
- posting lists in lexicographic term order (/root/reference/src/lib.rs:1067-1069).

This is an EXCHANGE path, not our store: export walks the distributed index
(shard-ordered concat per term) into one local file; import turns a CIFF file
into DataFrames suitable for ``IndexStore``. The write path streams
message-at-a-time; on the read side ``iter_ciff`` streams decoded messages
over an mmap (constant memory), while ``read_ciff`` is the materializing
convenience wrapper (lists in RAM — fine for exchange-file sizes, use
``iter_ciff`` for anything big).

Partial export (proto:16-21 — the load-bearing ``num_*`` < ``total_*``
distinction): ``export_index_to_ciff(..., terms=[...])`` writes only the
requested posting lists while the header keeps the COLLECTION-global
statistics (total vocabulary size, total docs, total terms, avgdl), so a
query-term-only file still scores BM25 identically to the full index.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field


# ---------------------------------------------------------------------------
# minimal proto3 wire codec
# ---------------------------------------------------------------------------

def _write_varint(out: io.BytesIO, v: int) -> None:
    if v < 0:
        v &= (1 << 64) - 1  # proto int32/int64 negatives: 10-byte two's complement
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _signed32(v: int) -> int:
    v &= (1 << 64) - 1
    v &= (1 << 32) - 1
    return v - (1 << 32) if v >= (1 << 31) else v


def _signed64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def _emit_field(out: io.BytesIO, num: int, wire: int, payload) -> None:
    _write_varint(out, (num << 3) | wire)
    if wire == 0:
        _write_varint(out, payload)
    elif wire == 1:  # fixed64
        out.write(payload)
    elif wire == 2:
        _write_varint(out, len(payload))
        out.write(payload)
    else:
        raise ValueError(f"wire {wire}")


def _parse_fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = bytes(buf[pos : pos + 8])
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            val = bytes(buf[pos : pos + 4])
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield num, wire, val


# ---------------------------------------------------------------------------
# CIFF messages
# ---------------------------------------------------------------------------

@dataclass
class CiffHeader:
    version: int = 1
    num_postings_lists: int = 0
    num_docs: int = 0
    total_postings_lists: int = 0
    total_docs: int = 0
    total_terms_in_collection: int = 0
    average_doclength: float = 0.0
    description: str = ""


@dataclass
class CiffPostingsList:
    term: str = ""
    df: int = 0
    cf: int = 0
    postings: list[tuple[int, int]] = field(default_factory=list)  # (docid_gap, tf)


@dataclass
class CiffDocRecord:
    docid: int = 0
    collection_docid: str = ""
    doclength: int = 0


def _enc_header(h: CiffHeader) -> bytes:
    import struct

    out = io.BytesIO()
    if h.version:
        _emit_field(out, 1, 0, h.version)
    if h.num_postings_lists:
        _emit_field(out, 2, 0, h.num_postings_lists)
    if h.num_docs:
        _emit_field(out, 3, 0, h.num_docs)
    if h.total_postings_lists:
        _emit_field(out, 4, 0, h.total_postings_lists)
    if h.total_docs:
        _emit_field(out, 5, 0, h.total_docs)
    if h.total_terms_in_collection:
        _emit_field(out, 6, 0, h.total_terms_in_collection)
    if h.average_doclength != 0.0:
        _emit_field(out, 7, 1, struct.pack("<d", h.average_doclength))
    if h.description:
        _emit_field(out, 8, 2, h.description.encode())
    return out.getvalue()


def _dec_header(buf: memoryview) -> CiffHeader:
    import struct

    h = CiffHeader(version=0)
    for num, wire, val in _parse_fields(buf):
        if num == 1:
            h.version = _signed32(val)
        elif num == 2:
            h.num_postings_lists = _signed32(val)
        elif num == 3:
            h.num_docs = _signed32(val)
        elif num == 4:
            h.total_postings_lists = _signed32(val)
        elif num == 5:
            h.total_docs = _signed32(val)
        elif num == 6:
            h.total_terms_in_collection = _signed64(val)
        elif num == 7:
            h.average_doclength = struct.unpack("<d", val)[0]
        elif num == 8:
            h.description = bytes(val).decode()
    for name in ("num_postings_lists", "num_docs", "total_postings_lists", "total_docs"):
        if getattr(h, name) < 0:
            raise ValueError(f"negative header count {name}")  # ≙ lib.rs:168-179 fail-fast
    return h


def _enc_posting(docid_gap: int, tf: int) -> bytes:
    out = io.BytesIO()
    if docid_gap:
        _emit_field(out, 1, 0, docid_gap)
    if tf:
        _emit_field(out, 2, 0, tf)
    return out.getvalue()


def _enc_postings_list(pl: CiffPostingsList) -> bytes:
    out = io.BytesIO()
    if pl.term:
        _emit_field(out, 1, 2, pl.term.encode())
    if pl.df:
        _emit_field(out, 2, 0, pl.df)
    if pl.cf:
        _emit_field(out, 3, 0, pl.cf)
    for gap, tf in pl.postings:
        _emit_field(out, 4, 2, _enc_posting(gap, tf))
    return out.getvalue()


def _dec_postings_list(buf: memoryview) -> CiffPostingsList:
    pl = CiffPostingsList()
    for num, wire, val in _parse_fields(buf):
        if num == 1:
            pl.term = bytes(val).decode()
        elif num == 2:
            pl.df = _signed64(val)
        elif num == 3:
            pl.cf = _signed64(val)
        elif num == 4:
            gap = tf = 0
            for n2, _w2, v2 in _parse_fields(val):
                if n2 == 1:
                    gap = _signed32(v2)
                elif n2 == 2:
                    tf = _signed32(v2)
            pl.postings.append((gap, tf))
    return pl


def _enc_doc_record(d: CiffDocRecord) -> bytes:
    out = io.BytesIO()
    if d.docid:
        _emit_field(out, 1, 0, d.docid)
    if d.collection_docid:
        _emit_field(out, 2, 2, d.collection_docid.encode())
    if d.doclength:
        _emit_field(out, 3, 0, d.doclength)
    return out.getvalue()


def _dec_doc_record(buf: memoryview) -> CiffDocRecord:
    d = CiffDocRecord()
    for num, _wire, val in _parse_fields(buf):
        if num == 1:
            d.docid = _signed32(val)
        elif num == 2:
            d.collection_docid = bytes(val).decode()
        elif num == 3:
            d.doclength = _signed32(val)
    return d


# ---------------------------------------------------------------------------
# file-level read/write (length-delimited stream)
# ---------------------------------------------------------------------------

def iter_ciff(path: str):
    """Stream decoded messages over an mmap: yields ``("header", CiffHeader)``
    once, then ``("postings", CiffPostingsList)`` × num_postings_lists, then
    ``("doc", CiffDocRecord)`` × num_docs. Constant memory beyond the page
    cache — the import analog of the reference's CodedInputStream loop
    (/root/reference/src/lib.rs:504-513)."""
    import mmap

    with open(path, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        try:
            data = memoryview(mm)
            pos = 0

            def next_msg():
                nonlocal pos
                ln, p = _read_varint(data, pos)
                msg = data[p : p + ln]
                pos = p + ln
                return msg

            header = _dec_header(next_msg())
            yield "header", header
            for _ in range(header.num_postings_lists):
                yield "postings", _dec_postings_list(next_msg())
            for i in range(header.num_docs):
                d = _dec_doc_record(next_msg())
                if d.docid != i:  # dense-order contract, ≙ lib.rs:545-547
                    raise ValueError(f"doc records out of order: got {d.docid} at {i}")
                yield "doc", d
        finally:
            del data
            mm.close()


def read_ciff(path: str) -> tuple[CiffHeader, list[CiffPostingsList], list[CiffDocRecord]]:
    """Materializing wrapper over ``iter_ciff`` (whole file decoded into
    lists — convenience for tests/small exchange files)."""
    header = None
    pls: list[CiffPostingsList] = []
    docs: list[CiffDocRecord] = []
    for kind, msg in iter_ciff(path):
        if kind == "header":
            header = msg
        elif kind == "postings":
            pls.append(msg)
        else:
            docs.append(msg)
    return header, pls, docs


def write_ciff(
    path: str,
    header: CiffHeader,
    postings_lists,
    doc_records,
) -> None:
    """postings_lists / doc_records may be any iterables (streamed)."""
    with open(path, "wb") as f:
        def emit(msg: bytes):
            lead = io.BytesIO()
            _write_varint(lead, len(msg))
            f.write(lead.getvalue())
            f.write(msg)

        emit(_enc_header(header))
        for pl in postings_lists:
            emit(_enc_postings_list(pl))
        for d in doc_records:
            emit(_enc_doc_record(d))


# ---------------------------------------------------------------------------
# index <-> CIFF bridges
# ---------------------------------------------------------------------------

def _frame(buf: io.BytesIO, msg: bytes) -> None:
    """Append one varint-length-delimited message to ``buf``."""
    _write_varint(buf, len(msg))
    buf.write(msg)


def _chunk_file_order(files: list[str], key_col: str) -> tuple[list, int]:
    """([(first_key, file)] sorted by key, Σ n_msgs) — ONE metadata pass over
    the chunk files, shared by every output that streams the same chunks."""
    import pyarrow.parquet as papq

    keyed = []
    total = 0
    for f in files:
        t = papq.read_table(f, columns=[key_col, "n_msgs"])
        if t.num_rows:
            keyed.append((t[key_col][0].as_py(), f))
            total += sum(v.as_py() for v in t["n_msgs"])
    return sorted(keyed), total


def _concat_chunk_files(
    fobj,
    files: list[str],
    key_col: str,
    payload_col: str = "payload",
    order: tuple[list, int] | None = None,
) -> int:
    """Stream ordered chunk payloads into ``fobj``; returns Σ n_msgs.

    Range partitioning makes every file's key range disjoint, so ordering
    FILES by their first key and keeping row order within a file yields the
    global message order. Payloads stream row-group-at-a-time (pyarrow
    ``iter_batches``) — driver memory is bounded by one row group, never the
    index. ``order``: pass a pre-computed ``_chunk_file_order`` result to
    avoid re-reading chunk metadata per output file."""
    import pyarrow.parquet as papq

    keyed, total = _chunk_file_order(files, key_col) if order is None else order
    for _, f in keyed:
        pf = papq.ParquetFile(f)
        for batch in pf.iter_batches(columns=[payload_col]):
            for payload in batch[payload_col]:
                fobj.write(payload.as_py())
    return total


def export_index_to_ciff(
    spark,
    index_root: str,
    out_path: str,
    id_sep: str = "/",
    terms: list[str] | None = None,
    chunk_bytes: int = 32 << 20,
    n_parts: int | None = None,
) -> CiffHeader:
    """Export the distributed index into one CIFF file (terms lex-sorted,
    per-term shards concatenated in shard order, docids re-gapped) —
    DISTRIBUTED: executors protobuf-encode varint-framed message chunks in
    parallel (the reference's streaming single-pass writer,
    /root/reference/src/lib.rs:639-678, made parallel), and the driver only
    CONCATENATES the ordered chunks into the output file. Nothing index-sized
    ever materializes on the driver — peak driver memory is one parquet row
    group of framed bytes; peak executor memory is one term's decoded
    postings plus the ~``chunk_bytes`` chunk under construction.

    Plan shape: postings repartitionByRange(term) → sortWithinPartitions
    (term, shard, first-block max_docid — compaction appends extra rows per
    (term, shard) that must concatenate in ascending docid order) → one
    mapInPandas pass frames whole PostingsLists into ≈``chunk_bytes`` chunks
    (chunks break only at term boundaries, so range disjointness + the
    in-partition sort give a total global order by each chunk's first term).
    DocRecords stream the same way, keyed by docid.

    ``terms``: PARTIAL export — write only these posting lists while keeping
    collection-global header statistics (``num_postings_lists`` <
    ``total_postings_lists``, proto:16-21): the file carries just a query
    set's lists yet any BM25 scorer reading it sees the full-collection N,
    avgdl and vocabulary size. DocRecords are always exported in full
    (doclengths are per-doc scorer state)."""
    import glob as _glob
    import shutil
    import uuid

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from ciff_spark.functions.codec import decode_postings
    from ciff_spark.store import IndexStore

    store = IndexStore(index_root)
    meta = store.meta(spark)
    parts = n_parts or max(2, min(64, spark.sparkContext.defaultParallelism))
    cb = int(chunk_bytes)
    sep = id_sep

    post = store.read(spark, "postings")
    if terms is not None:
        # term-pruned scan: the partial export never decodes unrequested lists
        post = post.where(F.col("term").isin(sorted(set(terms))))
    rp = (
        post.select("term", "shard", "df", "cf", "blocks")
        .repartitionByRange(parts, "term")
        .sortWithinPartitions("term", "shard", F.expr("blocks[0].max_docid"))
    )

    def enc_postings_chunks(iterator):
        buf = io.BytesIO()
        first_term: str | None = None
        n_msgs = 0
        # current term under assembly: decoded array parts + stats
        cur_term: str | None = None
        d_parts: list = []
        t_parts: list = []
        df = cf = 0

        def flush_term():
            nonlocal n_msgs, first_term, d_parts, t_parts, df, cf
            if cur_term is None:
                return
            out = io.BytesIO()
            _emit_field(out, 1, 2, cur_term.encode())
            if df:
                _emit_field(out, 2, 0, df)
            if cf:
                _emit_field(out, 3, 0, cf)
            if d_parts:
                d = np.concatenate(d_parts)
                t = np.concatenate(t_parts)
                # first posting absolute, later ones gaps (lib.rs:664-672)
                gaps = np.diff(np.concatenate(([0], d)))
                gaps[0] = d[0]
                for gap, tf in zip(gaps.tolist(), t.tolist()):
                    _emit_field(out, 4, 2, _enc_posting(gap, tf))
            _frame(buf, out.getvalue())
            if first_term is None:
                first_term = cur_term
            n_msgs += 1
            d_parts, t_parts, df, cf = [], [], 0, 0

        for pdf in iterator:
            for r in pdf.itertuples(index=False):
                if r.term != cur_term:
                    flush_term()
                    if buf.tell() >= cb:  # chunks break at term boundaries
                        yield pd.DataFrame(
                            [(first_term, n_msgs, buf.getvalue())],
                            columns=["key", "n_msgs", "payload"],
                        )
                        buf = io.BytesIO()
                        first_term, n_msgs = None, 0
                    cur_term = r.term
                d, t = decode_postings([dict(b) for b in r.blocks])
                if len(d):
                    d_parts.append(d)
                    t_parts.append(t)
                df += int(r.df)
                cf += int(r.cf)
        flush_term()
        if buf.tell():
            yield pd.DataFrame(
                [(first_term, n_msgs, buf.getvalue())],
                columns=["key", "n_msgs", "payload"],
            )

    docs_df = store.read(spark, "docs")
    id_cols = [c for c in docs_df.columns if c not in ("docid", "doclength")]
    docs_rp = docs_df.repartitionByRange(parts, "docid").sortWithinPartitions("docid")

    def enc_doc_chunks(iterator):
        buf = io.BytesIO()
        first_docid = None
        n_msgs = 0
        for pdf in iterator:
            # positional column access (pdf[c]) — itertuples renames columns
            # that aren't valid Python identifiers (or duplicates) to _N
            # fields, which would AttributeError a getattr-by-name here
            for docid, doclength, *ids in zip(
                pdf["docid"], pdf["doclength"], *(pdf[c] for c in id_cols)
            ):
                rec = CiffDocRecord(
                    docid=int(docid),
                    collection_docid=sep.join(str(v) for v in ids),
                    doclength=int(doclength),
                )
                _frame(buf, _enc_doc_record(rec))
                if first_docid is None:
                    first_docid = int(docid)
                n_msgs += 1
                if buf.tell() >= cb:
                    yield pd.DataFrame(
                        [(first_docid, n_msgs, buf.getvalue())],
                        columns=["key", "n_msgs", "payload"],
                    )
                    buf = io.BytesIO()
                    first_docid, n_msgs = None, 0
        if buf.tell():
            yield pd.DataFrame(
                [(first_docid, n_msgs, buf.getvalue())],
                columns=["key", "n_msgs", "payload"],
            )

    tmp = f"{out_path}.__chunks_{uuid.uuid4().hex[:8]}"
    try:
        rp.mapInPandas(
            enc_postings_chunks, schema="key string, n_msgs long, payload binary"
        ).write.mode("overwrite").parquet(f"{tmp}/postings")
        docs_rp.mapInPandas(
            enc_doc_chunks, schema="key bigint, n_msgs long, payload binary"
        ).write.mode("overwrite").parquet(f"{tmp}/docs")

        pfiles = sorted(_glob.glob(f"{tmp}/postings/*.parquet"))
        p_order = _chunk_file_order(pfiles, "key")
        n_pls = p_order[1]
        header = CiffHeader(
            version=1,
            num_postings_lists=int(n_pls),
            num_docs=int(meta["num_docs"]),
            total_postings_lists=int(meta["num_terms"]),
            total_docs=int(meta["num_docs"]),
            total_terms_in_collection=int(meta["total_terms"]),
            average_doclength=float(meta["avgdl"]),
            description=str(meta["description"]),
        )
        with open(out_path, "wb") as f:
            hdr = _enc_header(header)
            lead = io.BytesIO()
            _write_varint(lead, len(hdr))
            f.write(lead.getvalue())
            f.write(hdr)
            _concat_chunk_files(f, pfiles, "key", order=p_order)
            _concat_chunk_files(
                f, sorted(_glob.glob(f"{tmp}/docs/*.parquet")), "key"
            )
        return header
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def ciff_to_dataframes(spark, path: str):
    """Import a CIFF file → (meta dict, postings DF (term, docid, tf), docs DF)."""
    header, pls, recs = read_ciff(path)
    rows = []
    for pl in pls:
        absolute = 0
        for i, (gap, tf) in enumerate(pl.postings):
            absolute = gap if i == 0 else absolute + gap
            rows.append((pl.term, absolute, tf))
    postings = spark.createDataFrame(rows, "term string, docid bigint, tf bigint")
    docs = spark.createDataFrame(
        [(d.docid, d.collection_docid, d.doclength) for d in recs],
        "docid bigint, collection_docid string, doclength int",
    )
    meta = {
        "num_docs": header.num_docs,
        "num_terms": header.total_postings_lists,
        "total_terms": header.total_terms_in_collection,
        "avgdl": header.average_doclength,
        "description": header.description,
    }
    return meta, postings, docs
