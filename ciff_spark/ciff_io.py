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

def export_index_to_ciff(
    spark,
    index_root: str,
    out_path: str,
    id_sep: str = "/",
    terms: list[str] | None = None,
) -> CiffHeader:
    """Walk the distributed index into one CIFF file (terms lex-sorted,
    per-term shards concatenated in shard order, docids re-gapped).

    ``terms``: PARTIAL export — write only these posting lists while keeping
    collection-global header statistics (``num_postings_lists`` < ``
    total_postings_lists``, proto:16-21): the file carries just a query set's
    lists yet any BM25 scorer reading it sees the full-collection N, avgdl
    and vocabulary size. DocRecords are always exported in full (doclengths
    are per-doc scorer state)."""
    import numpy as np
    from pyspark.sql import functions as F

    from ciff_spark.functions.codec import decode_postings
    from ciff_spark.store import IndexStore

    store = IndexStore(index_root)
    meta = store.meta(spark)
    docs = store.read(spark, "docs").orderBy("docid").collect()
    id_cols = [c for c in docs[0].asDict() if c not in ("docid", "doclength")] if docs else []

    post = store.read(spark, "postings")
    if terms is not None:
        # term-pruned scan: the partial export never decodes unrequested lists
        post = post.where(F.col("term").isin(sorted(set(terms))))
    # third key: compaction appends extra rows per (term, shard); rows of a
    # term must concatenate in ascending docid order
    post_rows = post.orderBy("term", "shard", F.expr("blocks[0].max_docid")).collect()
    pls: list[CiffPostingsList] = []
    cur: CiffPostingsList | None = None
    last_doc = 0
    for r in post_rows:
        if cur is None or r["term"] != cur.term:
            cur = CiffPostingsList(term=r["term"])
            pls.append(cur)
            last_doc = 0
        d, t = decode_postings([b.asDict() for b in r["blocks"]])
        if len(d):
            # first posting of a term: absolute docid (last_doc reset to 0);
            # after that: gap to the previous posting (lib.rs:664-672)
            gaps = np.diff(np.concatenate(([last_doc], d)))
            cur.postings.extend(zip(gaps.tolist(), t.tolist()))
            last_doc = int(d[-1])
        cur.df += int(r["df"])
        cur.cf += int(r["cf"])

    header = CiffHeader(
        version=1,
        num_postings_lists=len(pls),
        num_docs=int(meta["num_docs"]),
        total_postings_lists=int(meta["num_terms"]),
        total_docs=int(meta["num_docs"]),
        total_terms_in_collection=int(meta["total_terms"]),
        average_doclength=float(meta["avgdl"]),
        description=str(meta["description"]),
    )
    recs = (
        CiffDocRecord(
            docid=int(r["docid"]),
            collection_docid=id_sep.join(str(r[c]) for c in id_cols),
            doclength=int(r["doclength"]),
        )
        for r in docs
    )
    write_ciff(out_path, header, pls, recs)
    return header


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
