"""Posting-list block codec: delta-gap + varint, with block-max metadata.

Generalizes the reference's whole-list delta-gap encoding (the PISA→CIFF
writer emits ``docid - last_doc`` per posting, /root/reference/src/lib.rs:664-672,
and the reader reconstructs absolutes with a running prefix sum,
/root/reference/src/lib.rs:252-259) to fixed-size, independently decodable
blocks, per the Block-Max WAND design (Ding & Suel, SIGIR 2011) that the
north-rule mandates:

- postings (sorted by docid ascending, docids unique within a list) are split
  into blocks of ``BLOCK_SIZE``, additionally capped at ``block_span`` docids
  of width (variable-sized blocks in the spirit of Mallia et al., "Faster
  BlockMax WAND with Variable-sized Blocks", SIGIR 2017): a SPARSE list's
  128-posting block would otherwise cover an entire docid shard, making its
  block-max bound apply everywhere and leaving WAND nothing to skip. Width
  capping is window-ALIGNED (break when ``docid // block_span`` changes) so
  block geometry is a pure function of the postings — independent of how
  rows were batched into encoder calls;
- block ``i`` stores docid gaps where the first gap is relative to block
  ``i-1``'s ``max_docid`` (−1 before the first block), so a block can be
  decoded knowing only the per-block metadata — enabling block skipping;
- per block we keep ``min_docid``/``max_docid`` (the TRUE covered range —
  ``min_docid`` exposes the coverage gaps between a sparse list's blocks,
  which is where the pruning win lives), ``max_tf``, and ``max_tfnorm``
  (the exact per-block BM25 tf-normalization upper bound, computed from
  true doc lengths at build time, stored ceil-rounded at BOUND_DECIMALS)
  for WAND pruning;
- SINGLE-POSTING blocks are IMPLICIT: width-capping a Zipf tail splits most
  sparse lists into 1-posting blocks (63% of all blocks on the 131k-turn
  corpus), whose min_docid == max_docid, max_tfnorm derives from (max_tf,
  dl[max_docid]) and whose bins re-encode the two stored fields — so they
  persist as (count=1, max_docid, max_tf, NULL, NULL, b"", b""). Readers
  synthesize the arrays (``decode_block``) and the kernel sets lo = hi and
  derives the bound. Measured: 28.7 → 24.8 MB postings on that corpus, no
  decode-ratio/serving change;
- all integers are LEB128 varints, encoded/decoded with vectorized NumPy —
  no per-value Python in the hot path.

Everything here is pure NumPy over host memory; Spark invokes it inside
Arrow-vectorized UDFs (``applyInPandas`` / ``mapInArrow``).
"""

from __future__ import annotations

import numpy as np

from ciff_spark.functions.scoring import tfnorm_np, tfnorm_upper_bound

BLOCK_SIZE = 128
#: docid-width cap per block (None = unbounded, pre-r4 geometry). 256 = 2×
#: BLOCK_SIZE: splits sparse lists into narrow blocks with real gaps between
#: them. Measured trade on the 131k-turn Zipf corpus with the FIXED
#: (non-adaptive) cap (postings bytes / zipf-mix decode ratio / selective
#: decode ratio):
#: span 512 → 26.0 MB / 0.42 / 0.19; 256 → 28.6 MB / 0.32 / 0.16;
#: 128 → 31.7 MB / 0.24 / 0.09; unbounded → 18.8 MB / 0.99 / 0.74.
#: Build wall is span-independent (same-window A/B: 11.0 s vs 10.7 s).
BLOCK_SPAN = 256

#: Adaptive per-list span (the default): a (term, shard) list is width-capped
#: ONLY when a full ``block_size``-posting block of it would span more than
#: ``SPAN_ADAPT_FACTOR × block_span`` docids — i.e. its average docid gap
#: exceeds SPAN_ADAPT_FACTOR · block_span / block_size (> 4 at the 128/256
#: defaults). Dense lists (stopwords, hot terms) thus keep clean
#: block_size-posting blocks: window-capping them bought no pruning (their
#: blocks are narrow already) but fragmented runt blocks at every window
#: edge — the fixed cap's +52% block-metadata bytes and the dense-corpus
#: build regression. Sparse lists — where the min_docid coverage gaps and
#: the WAND decode-ratio win live — keep the measured span=256 geometry
#: bit-identically. The decision is a pure function of the complete list
#: (the encoders see whole (term, shard) groups), so geometry stays
#: deterministic. Measured on the 131k-turn Zipf corpus: see BENCH/BASELINE.md
#: round-5 adaptive-span study.
SPAN_ADAPT_FACTOR = 2

#: per-block tf-bound precision: max_tfnorm is stored rounded UP to this many
#: decimals — still a true upper bound (pruning gets ≤ 1e-4 looser, scores
#: are decoded exactly regardless), and the collapsed value set lets parquet
#: dictionary-encode the column (~2.5 MB → ~0.4 MB on the 131k-turn Zipf
#: corpus)
BOUND_DECIMALS = 4


def _ceil_bound(x):
    """Round a tf bound UP at BOUND_DECIMALS (vectorized or scalar)."""
    scale = 10.0 ** BOUND_DECIMALS
    return np.ceil(np.asarray(x, np.float64) * scale) / scale

#: Spark SQL type of one encoded block (postings tables store array<BLOCK_TYPE>).
#: min_docid is nullable for indexes written before width-capped blocks; the
#: kernel falls back to the conservative prev_max+1 coverage then.
BLOCK_SCHEMA = (
    "struct<count:int,min_docid:bigint,max_docid:bigint,max_tf:int,"
    "max_tfnorm:double,docs_bin:binary,tfs_bin:binary>"
)


def _window_block_starts(
    docids: np.ndarray,
    new_grp: np.ndarray,
    block_size: int,
    block_span: int | None,
    adaptive: bool = True,
) -> np.ndarray:
    """Indices where a new block begins: at every group start, every
    ``block_span``-aligned docid window change (width-capped groups only,
    when ``adaptive``), and every ``block_size``-th posting within a
    (group, window) run. Fully vectorized.

    ``adaptive``: width-cap only the groups whose average docid gap exceeds
    ``SPAN_ADAPT_FACTOR · block_span / block_size`` (see SPAN_ADAPT_FACTOR);
    dense groups keep uncapped block_size-posting blocks. ``False`` restores
    the fixed-span r4 geometry (every group capped)."""
    n = len(docids)
    new_win = new_grp.copy()
    if block_span:
        w = docids // int(block_span)
        win_break = np.zeros(n, bool)
        win_break[1:] = w[1:] != w[:-1]
        if adaptive:
            grp_start = np.flatnonzero(new_grp)
            grp_end = np.append(grp_start[1:], n)
            width = docids[grp_end - 1] - docids[grp_start]
            span = np.maximum(grp_end - grp_start - 1, 1)  # gaps per group
            # sparse ⇔ avg_gap · block_size > SPAN_ADAPT_FACTOR · block_span
            sparse_g = width * block_size > SPAN_ADAPT_FACTOR * int(block_span) * span
            grp_id = np.cumsum(new_grp) - 1
            win_break &= sparse_g[grp_id]
        new_win |= win_break
    win_start = np.flatnonzero(new_win)
    win_id = np.cumsum(new_win) - 1
    local = np.arange(n) - win_start[win_id]
    return np.flatnonzero((local % block_size == 0) | new_win)


# ---------------------------------------------------------------------------
# varint (LEB128) — vectorized
# ---------------------------------------------------------------------------

def varint_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode non-negative ints to LEB128. Returns (uint8 buffer, per-value
    byte lengths). Vectorized: the only Python loop is over byte *positions*
    (≤ 10 iterations), never over values."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    nbytes = np.ones(n, np.int64)
    for shift in range(7, 64, 7):
        nbytes += (v >= (np.uint64(1) << np.uint64(shift))).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.empty(starts[-1], np.uint8)
    active = np.arange(n)
    shifted = v.copy()
    k = 0
    while active.size:
        cur = shifted[active]
        more = (k + 1) < nbytes[active]
        out[starts[active] + k] = (cur & np.uint64(0x7F)).astype(np.uint8) | (
            more.astype(np.uint8) << 7
        )
        shifted[active] = cur >> np.uint64(7)
        active = active[more]
        k += 1
    return out, nbytes


def varint_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte buffer to uint64 values (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else np.asarray(buf, np.uint8)
    if b.size == 0:
        return np.empty(0, np.uint64)
    is_last = (b & 0x80) == 0
    n = int(is_last.sum())
    if count is not None and count != n:
        raise ValueError(f"varint stream holds {n} values, expected {count}")
    val_idx = np.zeros(b.size, np.int64)
    val_idx[1:] = np.cumsum(is_last)[:-1]
    starts = np.zeros(n, np.int64)
    last_pos = np.flatnonzero(is_last)
    starts[1:] = last_pos[:-1] + 1
    k = (np.arange(b.size) - starts[val_idx]).astype(np.uint64)
    vals = np.zeros(n, np.uint64)
    np.add.at(vals, val_idx, (b & np.uint64(0x7F)).astype(np.uint64) << (np.uint64(7) * k))
    return vals


# ---------------------------------------------------------------------------
# block encode / decode
# ---------------------------------------------------------------------------

def encode_postings(
    docids: np.ndarray,
    tfs: np.ndarray,
    doclens: np.ndarray | None = None,
    avgdl: float | None = None,
    block_size: int = BLOCK_SIZE,
    block_span: int | None = BLOCK_SPAN,
    span_adaptive: bool = True,
) -> list[dict]:
    """Encode one posting list (docids strictly ascending, tfs > 0) into blocks.

    ``doclens``/``avgdl`` (when supplied) make ``max_tfnorm`` the *exact*
    per-block BM25 tf-bound; otherwise it falls back to the dl-free upper
    bound — still a true bound, just looser for pruning. ``block_span`` caps
    each block's docid width (see module docstring); ``None`` restores the
    count-only pre-r4 geometry.
    """
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n = docids.size
    if n == 0:
        return []
    if n > 1 and not (np.diff(docids) > 0).all():
        raise ValueError("docids must be strictly ascending within a posting list")
    if (tfs <= 0).any():
        raise ValueError("tfs must be positive")

    # gaps: the first value of each block decodes relative to the previous
    # block's max_docid (−1 before the first), which for consecutive blocks
    # is simply the plain diff
    gaps = np.empty(n, np.int64)
    gaps[0] = docids[0] + 1  # relative to virtual prev_max = -1
    gaps[1:] = np.diff(docids)
    one_grp = np.zeros(n, bool)
    one_grp[0] = True
    block_starts = _window_block_starts(
        docids, one_grp, block_size, block_span, span_adaptive
    )

    doc_buf, doc_lens = varint_encode(gaps.astype(np.uint64))
    tf_buf, tf_lens = varint_encode(tfs.astype(np.uint64))
    doc_off = np.concatenate(([0], np.cumsum(doc_lens)))
    tf_off = np.concatenate(([0], np.cumsum(tf_lens)))

    if doclens is not None and avgdl is not None:
        tfnorms = tfnorm_np(tfs, doclens, float(avgdl))
    else:
        tfnorms = None

    ends = np.append(block_starts[1:], n)
    blocks = []
    for s, e in zip(block_starts, ends):
        if e - s == 1:
            # implicit single-posting block: the posting IS (max_docid,
            # max_tf) — min_docid/max_tfnorm/bins all derive from it at read
            # time (62% of a Zipf corpus's width-capped blocks are singles;
            # dropping their redundant fields is most of the block-metadata
            # byte cost). Readers: decode_block synthesizes the arrays; the
            # WAND kernel sets lo=hi and derives the tf bound from max_tf.
            blocks.append(
                {
                    "count": 1,
                    "min_docid": None,
                    "max_docid": int(docids[s]),
                    "max_tf": int(tfs[s]),
                    "max_tfnorm": None,
                    "docs_bin": b"",
                    "tfs_bin": b"",
                }
            )
            continue
        if tfnorms is not None:
            max_tfnorm = float(_ceil_bound(tfnorms[s:e].max()))
        else:
            max_tfnorm = float(_ceil_bound(tfnorm_upper_bound(float(tfs[s:e].max()))))
        blocks.append(
            {
                "count": int(e - s),
                "min_docid": int(docids[s]),
                "max_docid": int(docids[e - 1]),
                "max_tf": int(tfs[s:e].max()),
                "max_tfnorm": max_tfnorm,
                "docs_bin": doc_buf[doc_off[s] : doc_off[e]].tobytes(),
                "tfs_bin": tf_buf[tf_off[s] : tf_off[e]].tobytes(),
            }
        )
    return blocks


def encode_many(
    terms,
    shards: np.ndarray,
    docids: np.ndarray,
    tfs: np.ndarray,
    doclens: np.ndarray | None,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
    block_span: int | None = BLOCK_SPAN,
    span_adaptive: bool = True,
):
    """Encode MANY posting lists at once — the whole-partition fast path.

    Input rows must be pre-sorted by (term, shard, docid); encodes every
    (term, shard) group in one vectorized pass: gap computation, LEB128, and
    per-block maxima (``np.maximum.reduceat``) run over the full partition
    with no per-group Python/pandas. Per-group work is reduced to slicing the
    shared byte buffer — ~100× faster than a per-group Arrow UDF when groups
    are small (Zipf tail).

    Yields tuples (term, shard, df, cf, blocks) where blocks is the same
    list-of-dicts ``encode_postings`` produces (bit-identical output).
    """
    n = len(docids)
    if n == 0:
        return []
    docids = np.ascontiguousarray(docids, np.int64)
    tfs = np.ascontiguousarray(tfs, np.int64)
    terms = np.asarray(terms, dtype=object)
    shards = np.ascontiguousarray(shards, np.int64)

    new_grp = np.empty(n, bool)
    new_grp[0] = True
    new_grp[1:] = (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
    grp_start = np.flatnonzero(new_grp)
    grp_id = np.cumsum(new_grp) - 1
    g = len(grp_start)

    gaps = np.empty(n, np.int64)
    gaps[0] = 0
    gaps[1:] = docids[1:] - docids[:-1]
    gaps[grp_start] = docids[grp_start] + 1
    if n > 1 and (gaps[~new_grp] <= 0).any():
        raise ValueError("docids must be strictly ascending within each group")
    if (tfs <= 0).any():
        raise ValueError("tfs must be positive")

    blk_start = _window_block_starts(
        docids, new_grp, block_size, block_span, span_adaptive
    )
    blk_end = np.empty(len(blk_start), np.int64)
    blk_end[:-1] = blk_start[1:]
    blk_end[-1] = n
    blk_grp = grp_id[blk_start]

    counts = blk_end - blk_start
    min_docid = docids[blk_start]
    max_docid = docids[blk_end - 1]
    max_tf = np.maximum.reduceat(tfs, blk_start)
    if doclens is not None:
        tfnorm = tfnorm_np(tfs, doclens, float(avgdl))
        max_tfn = np.maximum.reduceat(tfnorm, blk_start)
    else:
        # dl-free true upper bound (sup over dl→0) — used when the doclength
        # array is too large to broadcast; looser pruning, same exactness
        max_tfn = tfnorm_upper_bound(max_tf.astype(np.float64))  # broadcasts
    max_tfn = _ceil_bound(max_tfn)

    dbuf, dlens = varint_encode(gaps.astype(np.uint64))
    tbuf, tlens = varint_encode(tfs.astype(np.uint64))
    doff = np.concatenate(([0], np.cumsum(dlens)))
    toff = np.concatenate(([0], np.cumsum(tlens)))
    dbytes = dbuf.tobytes()
    tbytes = tbuf.tobytes()

    grp_end = np.append(grp_start[1:], n)
    df_g = grp_end - grp_start
    cf_g = np.add.reduceat(tfs, grp_start)
    b0 = np.searchsorted(blk_grp, np.arange(g))
    b1 = np.append(b0[1:], len(blk_start))

    out = []
    for gi in range(g):
        blocks = [
            {
                # implicit single-posting block (see encode_postings)
                "count": 1,
                "min_docid": None,
                "max_docid": int(max_docid[b]),
                "max_tf": int(max_tf[b]),
                "max_tfnorm": None,
                "docs_bin": b"",
                "tfs_bin": b"",
            }
            if counts[b] == 1
            else {
                "count": int(counts[b]),
                "min_docid": int(min_docid[b]),
                "max_docid": int(max_docid[b]),
                "max_tf": int(max_tf[b]),
                "max_tfnorm": float(max_tfn[b]),
                "docs_bin": dbytes[doff[blk_start[b]] : doff[blk_end[b]]],
                "tfs_bin": tbytes[toff[blk_start[b]] : toff[blk_end[b]]],
            }
            for b in range(b0[gi], b1[gi])
        ]
        out.append(
            (terms[grp_start[gi]], int(shards[grp_start[gi]]),
             int(df_g[gi]), int(cf_g[gi]), blocks)
        )
    return out


def encode_arrow_batch(
    term_arr,
    docids: np.ndarray,
    tfs: np.ndarray,
    doclens: np.ndarray | None,
    avgdl: float,
    shard_size: int,
    block_size: int = BLOCK_SIZE,
    term_codes: np.ndarray | None = None,
    term_dict=None,
    block_span: int | None = BLOCK_SPAN,
    span_adaptive: bool = True,
):
    """Arrow-native multi-group encoder: same output as ``encode_many`` but
    with ZERO per-group Python objects. Terms stay an Arrow string array
    (group boundaries come from dictionary codes), and the blocks column is
    assembled as a ListArray<Struct> whose binary children are built directly
    on the shared varint buffer (the concatenation of all blocks' bytes IS
    the buffer — offsets index into it, no per-block slicing/copies).

    Callers that already dictionary-encoded the terms pass ``term_codes``
    (int64 per row) + ``term_dict`` (the pa.StringArray dictionary) instead
    of ``term_arr`` — the per-group term strings then materialize only at
    group granularity (dict.take), never per posting row.

    Returns a pyarrow.RecordBatch(term, shard, df, cf, blocks).
    """
    import pyarrow as pa

    n = len(docids)
    assert n > 0
    if term_codes is not None:
        codes = np.ascontiguousarray(term_codes, np.int64)
    else:
        codes = term_arr.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
    docids = np.ascontiguousarray(docids, np.int64)
    tfs = np.ascontiguousarray(tfs, np.int64)
    shards = docids // shard_size

    new_grp = np.empty(n, bool)
    new_grp[0] = True
    new_grp[1:] = (codes[1:] != codes[:-1]) | (shards[1:] != shards[:-1])
    grp_start = np.flatnonzero(new_grp)
    grp_id = np.cumsum(new_grp) - 1
    g = len(grp_start)

    gaps = np.empty(n, np.int64)
    gaps[0] = 0
    gaps[1:] = docids[1:] - docids[:-1]
    gaps[grp_start] = docids[grp_start] + 1
    if n > 1 and (gaps[~new_grp] <= 0).any():
        raise ValueError("docids must be strictly ascending within each group")
    if (tfs <= 0).any():
        raise ValueError("tfs must be positive")

    blk_start = _window_block_starts(
        docids, new_grp, block_size, block_span, span_adaptive
    )
    blk_end = np.empty(len(blk_start), np.int64)
    blk_end[:-1] = blk_start[1:]
    blk_end[-1] = n
    blk_grp = grp_id[blk_start]
    nb = len(blk_start)

    counts = (blk_end - blk_start).astype(np.int32)
    min_docid = docids[blk_start]
    max_docid = docids[blk_end - 1]
    max_tf = np.maximum.reduceat(tfs, blk_start).astype(np.int32)
    if doclens is not None:
        tfnorm = tfnorm_np(tfs, doclens, float(avgdl))
        max_tfn = np.maximum.reduceat(tfnorm, blk_start)
    else:
        max_tfn = tfnorm_upper_bound(max_tf.astype(np.float64))
    max_tfn = _ceil_bound(max_tfn)

    dbuf, dlens = varint_encode(gaps.astype(np.uint64))
    tbuf, tlens = varint_encode(tfs.astype(np.uint64))
    doff = np.zeros(n + 1, np.int64)
    np.cumsum(dlens, out=doff[1:])
    toff = np.zeros(n + 1, np.int64)
    np.cumsum(tlens, out=toff[1:])
    # binary children: offsets at block boundaries straight into the buffer.
    # pa.binary() carries int32 offsets — guard the 2 GiB-per-partition
    # boundary explicitly (raise, never wrap); hit it → raise n_pgroups /
    # encode partitions so each partition's varint buffer shrinks
    if doff[-1] > np.iinfo(np.int32).max or toff[-1] > np.iinfo(np.int32).max:
        raise ValueError(
            f"encoded partition exceeds 2GiB ({doff[-1]}/{toff[-1]} bytes); "
            "increase n_pgroups so per-partition posting bytes fit int32 offsets"
        )
    # implicit single-posting blocks (see encode_postings): their bins are
    # empty and min_docid/max_tfnorm null. Compact the shared varint buffers
    # so singles' (redundant) bytes never reach the file — vectorized byte
    # drop via a range-marking cumsum, no per-block Python
    single = counts == 1
    d_blen = doff[blk_end] - doff[blk_start]
    t_blen = toff[blk_end] - toff[blk_start]
    if single.any():
        d_blen = d_blen.copy()
        t_blen = t_blen.copy()
        d_blen[single] = 0
        t_blen[single] = 0

        def _drop_ranges(buf, off):
            mark = np.zeros(len(buf) + 1, np.int64)
            np.add.at(mark, off[blk_start[single]], 1)
            np.add.at(mark, off[blk_end[single]], -1)
            return buf[np.cumsum(mark[:-1]) == 0]

        dbuf = _drop_ranges(dbuf, doff)
        tbuf = _drop_ranges(tbuf, toff)
    d_offsets = np.zeros(nb + 1, np.int64)
    np.cumsum(d_blen, out=d_offsets[1:])
    t_offsets = np.zeros(nb + 1, np.int64)
    np.cumsum(t_blen, out=t_offsets[1:])
    docs_bin = pa.Array.from_buffers(
        pa.binary(), nb,
        [None, pa.py_buffer(d_offsets.astype(np.int32).tobytes()), pa.py_buffer(dbuf.tobytes())],
    )
    tfs_bin = pa.Array.from_buffers(
        pa.binary(), nb,
        [None, pa.py_buffer(t_offsets.astype(np.int32).tobytes()), pa.py_buffer(tbuf.tobytes())],
    )
    block_struct = pa.StructArray.from_arrays(
        [
            pa.array(counts, pa.int32()),
            pa.array(min_docid, pa.int64(), mask=single),
            pa.array(max_docid, pa.int64()),
            pa.array(max_tf, pa.int32()),
            pa.array(max_tfn, pa.float64(), mask=single),
            docs_bin,
            tfs_bin,
        ],
        ["count", "min_docid", "max_docid", "max_tf", "max_tfnorm", "docs_bin", "tfs_bin"],
    )
    b0 = np.searchsorted(blk_grp, np.arange(g))
    list_offsets = np.append(b0, nb).astype(np.int32)
    blocks = pa.ListArray.from_arrays(pa.array(list_offsets, pa.int32()), block_struct)

    grp_end = np.append(grp_start[1:], n)
    df_g = (grp_end - grp_start).astype(np.int64)
    cf_g = np.add.reduceat(tfs, grp_start).astype(np.int64)
    if term_codes is not None:
        terms_out = term_dict.take(pa.array(codes[grp_start], pa.int64()))
    else:
        terms_out = term_arr.take(pa.array(grp_start, pa.int64()))
    return pa.RecordBatch.from_arrays(
        [
            terms_out,
            pa.array(shards[grp_start].astype(np.int32), pa.int32()),
            pa.array(df_g, pa.int64()),
            pa.array(cf_g, pa.int64()),
            blocks,
        ],
        ["term", "shard", "df", "cf", "blocks"],
    )


def decode_block(
    docs_bin: bytes,
    tfs_bin: bytes,
    count: int,
    prev_max_docid: int,
    max_docid: int | None = None,
    max_tf: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block given the previous block's max_docid (−1 for first).

    Implicit single-posting blocks (count == 1, empty bins — see
    encode_postings) synthesize their arrays from the block metadata; callers
    pass ``max_docid``/``max_tf`` to enable that path."""
    if count == 1 and not docs_bin:
        if max_docid is None or max_tf is None:
            raise ValueError(
                "implicit single-posting block needs max_docid/max_tf"
            )
        return np.array([max_docid], np.int64), np.array([max_tf], np.int64)
    gaps = varint_decode(docs_bin, count).astype(np.int64)
    docids = gaps.cumsum() + prev_max_docid
    tfs = varint_decode(tfs_bin, count).astype(np.int64)
    return docids, tfs


def decode_block_dict(blk: dict, prev_max_docid: int) -> tuple[np.ndarray, np.ndarray]:
    """``decode_block`` over a block mapping (dict / pyarrow struct scalar /
    Spark Row) — the one decode entry point every reader should use."""
    return decode_block(
        blk["docs_bin"], blk["tfs_bin"], blk["count"], prev_max_docid,
        blk["max_docid"], blk["max_tf"],
    )


def decode_postings(blocks: list[dict]) -> tuple[np.ndarray, np.ndarray]:
    """Decode a full posting list from its blocks."""
    if not blocks:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    doc_parts, tf_parts = [], []
    prev_max = -1
    for blk in blocks:
        d, t = decode_block_dict(blk, prev_max)
        doc_parts.append(d)
        tf_parts.append(t)
        prev_max = int(blk["max_docid"])
    return np.concatenate(doc_parts), np.concatenate(tf_parts)
