"""Codec unit + property tests.

Mirrors the reference's test layers (SURVEY §5): round-trip/metamorphic tests
on the gap codec (the reference round-trips CIFF→PISA→CIFF,
/root/reference/tests/toy.rs:89-143) and quickcheck-style property tests
(/root/reference/src/binary_collection.rs:427-437) via hypothesis.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ciff_spark.functions.codec import (
    BLOCK_SIZE,
    BLOCK_SPAN,
    decode_block,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)
from ciff_spark.functions.scoring import idf_np, tfnorm_np


def _roundtrip(vals):
    buf, lens = varint_encode(np.asarray(vals, np.uint64))
    assert int(lens.sum()) == buf.size
    out = varint_decode(buf.tobytes(), len(vals))
    np.testing.assert_array_equal(out.astype(np.uint64), np.asarray(vals, np.uint64))


def test_varint_known_bytes():
    buf, lens = varint_encode(np.array([0, 1, 127, 128, 300, 2**32], np.uint64))
    assert list(lens) == [1, 1, 1, 2, 2, 5]
    assert buf[:5].tobytes() == bytes([0x00, 0x01, 0x7F, 0x80, 0x01])
    assert buf[5:7].tobytes() == bytes([0xAC, 0x02])  # 300 = LEB128 ac 02


def test_varint_roundtrip_edges():
    _roundtrip([])
    _roundtrip([0])
    _roundtrip([2**63 - 1, 0, 1, 2**32 - 1, 127, 128, 16383, 16384])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_varint_roundtrip_property(vals):
    _roundtrip(vals)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 10_000_000), st.integers(1, 1000)),
        min_size=1,
        max_size=400,
    )
)
def test_block_roundtrip_property(pairs):
    # build strictly ascending docids from positive gaps
    gaps = np.array([p[0] for p in pairs], np.int64)
    docids = np.cumsum(gaps) - 1
    tfs = np.array([p[1] for p in pairs], np.int64)
    blocks = encode_postings(docids, tfs, block_size=7)  # tiny blocks → many
    d, t = decode_postings(blocks)
    np.testing.assert_array_equal(d, docids)
    np.testing.assert_array_equal(t, tfs)
    # per-block invariants: max_docid is a true skip pointer, counts sum up
    assert sum(b["count"] for b in blocks) == len(docids)
    prev = -1
    for b in blocks:
        bd, bt = decode_block(
            b["docs_bin"], b["tfs_bin"], b["count"], prev,
            b["max_docid"], b["max_tf"],
        )
        assert bd[-1] == b["max_docid"]
        assert bt.max() == b["max_tf"]
        assert (bd > prev).all()
        if b["count"] == 1:
            # implicit single-posting block: derived fields are elided
            assert b["min_docid"] is None and b["max_tfnorm"] is None
            assert b["docs_bin"] == b"" and b["tfs_bin"] == b""
        prev = b["max_docid"]


def test_block_max_tfnorm_is_true_upper_bound():
    rng = np.random.default_rng(42)
    n = 1000
    docids = np.cumsum(rng.integers(1, 50, n))
    tfs = rng.integers(1, 30, n)
    doclens = rng.integers(5, 400, n)
    avgdl = 87.3
    blocks = encode_postings(docids, tfs, doclens=doclens, avgdl=avgdl)
    tfn = tfnorm_np(tfs, doclens, avgdl)
    s = 0
    for b in blocks:
        e = s + b["count"]
        if b["count"] == 1:
            assert b["max_tfnorm"] is None and b["min_docid"] is None
            assert b["max_docid"] == docids[s]
            s = e
            continue
        # stored bound: true max, ceil-rounded at BOUND_DECIMALS (still a
        # true upper bound; ≤ 1e-4 looser)
        assert b["max_tfnorm"] >= tfn[s:e].max() - 1e-12
        assert b["max_tfnorm"] <= tfn[s:e].max() + 10.0 ** -4
        assert b["count"] <= BLOCK_SIZE
        assert b["min_docid"] == docids[s] and b["max_docid"] == docids[e - 1]
        # width cap is window-aligned: a block never straddles a BLOCK_SPAN
        # boundary (geometry must be independent of encoder batching)
        assert b["min_docid"] // BLOCK_SPAN == b["max_docid"] // BLOCK_SPAN
        s = e
    assert s == n


def test_adaptive_span_dense_vs_sparse():
    """Adaptive span: dense lists keep clean BLOCK_SIZE-posting blocks (no
    window-edge runts); sparse lists keep the width-capped, window-aligned
    geometry where the WAND coverage gaps live."""
    n = 1000
    tfs = np.ones(n, np.int64)

    # avg gap 3 ≤ SPAN_ADAPT_FACTOR·span/size = 4 → dense → uncapped
    dense = np.arange(n, dtype=np.int64) * 3
    blocks = encode_postings(dense, tfs)
    assert all(b["count"] == BLOCK_SIZE for b in blocks[:-1])
    d, t = decode_postings(blocks)
    np.testing.assert_array_equal(d, dense)

    # fixed-span mode fragments the same list at every 256-docid window edge
    blocks_fixed = encode_postings(dense, tfs, span_adaptive=False)
    assert len(blocks_fixed) > len(blocks)
    assert any(b["count"] < BLOCK_SIZE for b in blocks_fixed[:-1])
    d, t = decode_postings(blocks_fixed)
    np.testing.assert_array_equal(d, dense)

    # avg gap 40 > 4 → sparse → capped AND window-aligned, identical to the
    # fixed-span geometry (the pruning-proven r4 shape)
    sparse = np.arange(n, dtype=np.int64) * 40
    blocks_s = encode_postings(sparse, tfs)
    assert all(
        b["min_docid"] // BLOCK_SPAN == b["max_docid"] // BLOCK_SPAN
        for b in blocks_s
        if b["count"] > 1  # implicit singles elide min_docid
    )
    assert blocks_s == encode_postings(sparse, tfs, span_adaptive=False)
    d, t = decode_postings(blocks_s)
    np.testing.assert_array_equal(d, sparse)


def test_encode_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_postings(np.array([3, 3]), np.array([1, 1]))
    with pytest.raises(ValueError):
        encode_postings(np.array([1, 2]), np.array([1, 0]))
    assert encode_postings(np.array([], np.int64), np.array([], np.int64)) == []


def test_idf_matches_reference_formula():
    # idf = ln((N - df + 0.5)/(df + 0.5)) — negative for df > N/2 is kept
    assert idf_np(1, 3) == pytest.approx(np.log(2.5 / 1.5))
    assert idf_np(3, 3) < 0


def test_encode_arrow_batch_equals_encode_many():
    """The Arrow-native partition encoder must produce bit-identical blocks
    to the readable reference implementation."""
    import pyarrow as pa

    from ciff_spark.functions.codec import encode_arrow_batch, encode_many

    rng = np.random.default_rng(11)
    rows = []
    for t in [f"t{i:03d}" for i in range(40)]:
        df_ = int(rng.integers(1, 300))
        docids = np.sort(rng.choice(5000, df_, replace=False))
        for d in docids:
            rows.append((t, int(d), int(rng.integers(1, 9))))
    rows.sort()
    terms = np.array([r[0] for r in rows], object)
    docids = np.array([r[1] for r in rows], np.int64)
    tfs = np.array([r[2] for r in rows], np.int64)
    dls = rng.integers(5, 100, 5000).astype(np.uint32)

    shard_size = 700
    exp = encode_many(terms, docids // shard_size, docids, tfs, dls[docids], 42.0, 16)
    batch = encode_arrow_batch(
        pa.array(terms.tolist(), pa.string()), docids, tfs, dls[docids], 42.0,
        shard_size, 16,
    )
    got = batch.to_pylist()
    assert len(got) == len(exp)
    for g, (term, shard, df_, cf, blocks) in zip(got, exp):
        assert g["term"] == term and g["shard"] == shard
        assert g["df"] == df_ and g["cf"] == cf
        assert len(g["blocks"]) == len(blocks)
        for gb, eb in zip(g["blocks"], blocks):
            assert gb["count"] == eb["count"]
            assert gb["max_docid"] == eb["max_docid"]
            assert gb["max_tf"] == eb["max_tf"]
            assert gb["min_docid"] == eb["min_docid"]
            if eb["max_tfnorm"] is None:  # implicit single-posting block
                assert gb["max_tfnorm"] is None
            else:
                assert gb["max_tfnorm"] == pytest.approx(eb["max_tfnorm"])
            assert gb["docs_bin"] == eb["docs_bin"]
            assert gb["tfs_bin"] == eb["tfs_bin"]
