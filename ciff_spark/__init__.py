"""ciff_spark — a PySpark-native inverted-index build + BM25 top-k query engine.

Inspired by the data model of pisa-engine/ciff (the Common Index File Format:
one Header, N PostingsLists of delta-gapped (docid, tf) postings, M DocRecords —
see /root/reference/proto/common-index-format-v1.proto:10-55), re-designed from
scratch for Spark's distributed execution model:

- the index is a set of columnar tables (Parquet here; Iceberg in production),
  not a single flat file: ``postings`` (one row per (term, shard)), ``term_stats``,
  ``docs``, ``shard_sizes``, ``index_meta``, ``_lineage``;
- posting lists are block-compressed (d-gap + varint, 128 postings/block) with
  per-block max_docid / max_tf / max_tfnorm for Block-Max WAND pruning —
  generalizing the reference's whole-list d-gap encoding
  (/root/reference/src/lib.rs:664-672) to skippable blocks;
- the build is a declarative DataFrame pipeline (tokenize → explode → hash-agg
  tf → shard-salted groupBy → Arrow-vectorized block encode) so Catalyst handles
  pushdown, pruning, partial aggregation and AQE;
- hot-term skew is handled structurally: postings are sharded by docid range
  (``shard = docid // shard_size``), so a Zipf-hot term is split across shards
  and the per-term "merge" is pure concatenation in shard order.

Nothing here is a port of the reference's Rust code; the reference defines WHAT
an index is (invariants, statistics, ordering contracts), this package decides
HOW with Spark idioms.
"""

__version__ = "0.1.0"

from ciff_spark.session import get_spark  # noqa: F401
