"""Query side: BM25 top-k over a built index (exact and Block-Max WAND), and
the index-free relational BM25 used for SQL-oracle parity.

Three implementations of the same pinned semantics:

- ``bm25_topk_relational``: pure DataFrame ops straight off a corpus table
  (tokenize → tf → doc/term stats → joins → score → top-k). 100% built-in
  expressions — Catalyst/AQE plan it, no Python in the loop. This is also the
  definition the DuckDB driver-oracle SQL mirrors fragment-by-fragment.
- ``IndexReader.topk(mode="exact")``: decode the term-pruned posting blocks
  (Parquet predicate pushdown on ``term``), attach doclengths per docid-shard
  via cogroup with ``shard_sizes`` (never joining the wide docs table),
  score vectorized, hash-agg per (qid, docid), per-qid window top-k.
- ``IndexReader.topk(mode="wand")``: per (shard) Arrow group runs the
  interval block-max kernel (ciff_spark.wand) — decodes only blocks whose
  upper bound can still beat the running top-k threshold.

All paths break ties by ascending docid and (for driver-facing outputs)
round scores to ``SCORE_DECIMALS``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ciff_spark.functions.codec import decode_block_dict
from ciff_spark.functions.scoring import (
    SCORE_DECIMALS,
    idf_col,
    idf_np,
    idf_sql,
    tfnorm_col,
    tfnorm_np,
    tfnorm_sql,
)
from ciff_spark.functions.tokenizer import tokenize_expr, tokenize_py, tokenize_sql
from ciff_spark.store import IndexStore
from ciff_spark.wand import wand_topk

#: below this many docid shards, ``shared_theta`` seeding is skipped (the
#: result is identical either way): the seed pass is an extra Spark job plus
#: a driver round-trip, and with few remaining shards the blocks it lets the
#: kernel skip are worth less than the job it costs (measured in the r5
#: driver bench: 2.02 s seeded vs 1.70 s plain on the 8-shard index).
SHARED_THETA_MIN_SHARDS = 16


# ---------------------------------------------------------------------------
# Relational (index-free) BM25 — built-ins only
# ---------------------------------------------------------------------------

def bm25_topk_relational(
    corpus: DataFrame,
    query: str,
    k: int = 10,
    docid_col: str = "docid",
    text_col: str = "text",
    round_scores: bool = True,
) -> DataFrame:
    """Exact BM25 top-k via pure DataFrame algebra (no index, no UDF).

    Single-scan friendly: tokens are exploded once; doc stats and term stats
    are two small aggregations Catalyst executes with partial aggregation;
    the query-term filter prunes the exploded stream immediately.
    """
    qterms = sorted(set(tokenize_py(query)))
    if not qterms:
        spark = corpus.sparkSession
        return spark.createDataFrame([], f"{docid_col} bigint, score double")

    toks = corpus.select(
        F.col(docid_col).cast("long").alias("docid"),
        F.explode(tokenize_expr(text_col)).alias("term"),
    )
    # doc stats over the FULL corpus: token-less docs (empty/punct-only text)
    # still count toward N and avgdl — matching the index build's docs table
    # (doclength 0), so the relational and index engines share one idf/avgdl
    dl = corpus.select(
        F.col(docid_col).cast("long").alias("docid"),
        F.coalesce(F.size(tokenize_expr(text_col)), F.lit(0)).alias("dl"),
    )
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).first()
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"])

    tf = (
        toks.where(F.col("term").isin(qterms))
        .groupBy("term", "docid")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "docid")
        .withColumn(
            "contrib",
            idf_col(F.col("df"), n_docs) * tfnorm_col(F.col("tf"), F.col("dl"), avgdl),
        )
        .groupBy("docid")
        .agg(F.sum("contrib").alias("score"))
    )
    if round_scores:
        # round BEFORE ranking: cross-engine f64 summation-order noise (~1 ulp)
        # must not flip the k-boundary or tie-breaks vs the oracle
        scored = scored.select("docid", F.round("score", SCORE_DECIMALS).alias("score"))
    out = scored.orderBy(F.desc("score"), F.asc("docid")).limit(k)
    return out.withColumnRenamed("docid", docid_col) if docid_col != "docid" else out


def bm25_topk_sql(
    query: str,
    k: int = 10,
    table: str = "documents",
    docid_col: str = "doc_id",
    text_col: str = "text",
    where: str | None = None,
) -> str:
    """DuckDB oracle SQL equivalent of ``bm25_topk_relational`` — generated
    from the same pinned fragments (tokenizer + scoring), so the two cannot
    drift apart. ``where``: optional metadata predicate over alias ``fd``
    (a re-join of ``table``) restricting the RESULT set — idf/avgdl stay
    collection-level, mirroring ``IndexReader.topk(doc_filter=...)``."""
    qterms = sorted(set(tokenize_py(query)))
    terms_in = ", ".join(f"'{t}'" for t in qterms) or "''"
    filt = (
        f"JOIN {table} fd ON scored.docid = fd.{docid_col} WHERE {where}"
        if where
        else ""
    )
    return f"""
WITH toks AS (
  SELECT {docid_col} AS docid, unnest({tokenize_sql(text_col)}) AS term
  FROM {table}
),
dl AS (SELECT {docid_col} AS docid,
              coalesce(len({tokenize_sql(text_col)}), 0)::BIGINT AS dl
       FROM {table}),
stats AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT term, docid, count(*)::BIGINT AS tf FROM toks
  WHERE term IN ({terms_in}) GROUP BY term, docid
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.docid,
         sum({idf_sql('df.df', 'stats.n')} * {tfnorm_sql('tf.tf', 'dl.dl', 'stats.avgdl')}) AS s
  FROM tf JOIN df USING (term) JOIN dl ON tf.docid = dl.docid CROSS JOIN stats
  GROUP BY tf.docid
)
SELECT scored.docid AS {docid_col}, round(s, {SCORE_DECIMALS}) AS score
FROM scored {filt}
ORDER BY round(s, {SCORE_DECIMALS}) DESC, scored.docid ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Index-backed top-k
# ---------------------------------------------------------------------------

#: docs at or below which the reader broadcasts the dense doclength array
#: (4 B/doc — 20 MB at the gate) instead of cogrouping the shard_sizes table
#: into every topk job: one exchange and one parquet scan fewer per query
#: batch. Same gate value as BuildConfig.dl_broadcast_max_docs.
DL_BROADCAST_MAX_DOCS = 5_000_000


class IndexReader:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.store = IndexStore(root)
        # meta is one row: read it driver-side with pyarrow — a topk call
        # should cost exactly ONE Spark job, not warmup jobs for metadata
        self.meta = self.store.meta_local()
        self._dl_bc = None  # lazily-built doclength broadcast (or False)

    def _dl_broadcast(self):
        """Broadcast of the dense doclength array, built once per reader
        from a driver-side pyarrow read of shard_sizes — only when the doc
        count is under the gate AND the bins fully cover 0..N-1 (a gap means
        a corrupt index; the cogroup path's fail-loud check handles it)."""
        if self._dl_bc is None:
            self._dl_bc = False
            n = int(self.meta["num_docs"])
            if 0 < n <= DL_BROADCAST_MAX_DOCS:
                import glob

                import pyarrow.dataset as pads

                from ciff_spark.build import _dl_array

                counts = pads.dataset(
                    glob.glob(self.store.path("shard_sizes") + "/*.parquet"),
                    format="parquet",
                ).to_table(columns=["count"])
                if int(sum(counts["count"].to_pylist())) == n:
                    self._dl_bc = self.spark.sparkContext.broadcast(
                        _dl_array(self.store, n)
                    )
        return self._dl_bc or None

    # -- helpers --------------------------------------------------------------

    def _query_frame(self, queries: list[tuple[int, str]]) -> tuple[pd.DataFrame, list[str]]:
        rows = []
        for qid, text in queries:
            for t in sorted(set(tokenize_py(text))):
                rows.append((int(qid), t))
        qpdf = pd.DataFrame(rows, columns=["qid", "term"])
        if qpdf.empty:
            return qpdf, []
        return qpdf, sorted(qpdf["term"].unique().tolist())

    def _idf_map(
        self, terms: list[str], scoring: str = "bm25"
    ) -> tuple[dict[str, float], list[int]]:
        """Per-term weight AND the terms' pgroup set from ``term_stats`` —
        driver-side pyarrow read with a term-IN predicate (row-group pruning
        on the sorted column), the same access path LocalSearcher uses. |q|
        rows come back; no Spark job. BM25 weight = idf(df, N); impact weight
        = 1.0 (the stored tf IS the quantized impact; the read still filters
        to terms the index knows). The pgroup list lets ``topk`` prune the
        postings scan to the queried pgroup partitions instead of opening
        every pgroup dir's footers (the same pruning LocalSearcher has had
        since r2 — the Spark reader scanned all of them until r6)."""
        if not terms:
            return {}, []
        import glob

        import pyarrow.compute as pc
        import pyarrow.dataset as ds

        n = int(self.meta["num_docs"])
        tbl = ds.dataset(
            glob.glob(self.store.path("term_stats") + "/*.parquet"), format="parquet"
        ).to_table(columns=["term", "df", "pgroup"], filter=pc.field("term").isin(terms))
        pgroups = sorted({int(g) for g in tbl["pgroup"].to_pylist() if g is not None})
        if scoring == "impact":
            return dict.fromkeys(tbl["term"].to_pylist(), 1.0), pgroups
        return {
            t: float(idf_np(int(d), n))
            for t, d in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist())
        }, pgroups

    # -- public API -----------------------------------------------------------

    def topk(
        self,
        queries: list[tuple[int, str]],
        k: int = 10,
        mode: str = "wand",
        round_scores: bool = False,
        shared_theta: bool = False,
        scoring: str = "bm25",
        doc_filter: DataFrame | None = None,
    ) -> DataFrame:
        """Top-k per query. Returns DataFrame(qid int, docid long, score double).

        ``scoring="impact"`` sums stored tf values as quantized impacts
        (term weight 1.0, doclengths unused) — the reference's learned-sparse
        model where PISA's quantized scorer ranks on Σ impact
        (/root/reference/src/lib.rs:87-148). Both ``exact`` and ``wand``
        modes support it; WAND bounds come from per-block ``max_tf``.

        ``round_scores=True`` ranks on scores rounded to ``SCORE_DECIMALS``
        INSIDE the kernels (heap, pruning threshold, final window) — the
        sound version of the driver/oracle ordering contract; no over-fetch.

        ``shared_theta=True`` (wand only) runs shard 0 first, collects each
        query's k-th score, and seeds every other shard's pruning threshold
        with it — one extra small job buying skipped blocks in all remaining
        shards; worthwhile when shards are large, overhead when the per-job
        fixed cost dominates (measured in bench.py).

        ``doc_filter``: optional single-column DataFrame of docids — results
        restrict to these docs (metadata-filtered search: the caller derives
        it from the docs table / any side predicate), while idf/avgdl stay
        COLLECTION-level (the standard filtered-search semantics). The
        filter applies as a semi-join on the per-(doc, term) contributions
        BEFORE aggregation — rows drop at the earliest relational point;
        exact mode only (WAND's pruning thresholds are heap-driven and the
        kernel does not see the filter).
        """
        if scoring not in ("bm25", "impact"):
            # validate HERE, not only in the wand kernel — mode="exact" with
            # a typo'd scoring would otherwise silently fall back to BM25
            raise ValueError(f"unknown scoring {scoring!r}")
        if doc_filter is not None and mode != "exact":
            raise ValueError("doc_filter requires mode='exact'")
        qpdf, terms = self._query_frame(queries)
        if not terms:
            return self.spark.createDataFrame([], "qid int, docid bigint, score double")
        idf, pgroups = self._idf_map(terms, scoring)
        qpdf = qpdf[qpdf["term"].isin(idf)].copy()
        qpdf["idf"] = qpdf["term"].map(idf)
        if qpdf.empty:
            return self.spark.createDataFrame([], "qid int, docid bigint, score double")
        qdf = self.spark.createDataFrame(qpdf)
        rd = SCORE_DECIMALS if round_scores else None

        # pgroup-partition-pruned + term-pruned scan: the pgroup IN filter
        # prunes whole pgroup=* partition dirs (PartitionFilters in the
        # plan), so only the queried terms' dirs are even opened; the term
        # IN predicate then row-group-prunes within them (PushedFilters).
        # Empty pgroup set with surviving terms would mean NULL pgroup
        # values in term_stats (no index this codebase writes, but a
        # mis-applied isin([]) would silently return nothing) — skip the
        # partition filter in that case rather than risk empty results.
        post = self.store.read(self.spark, "postings")
        if pgroups:
            post = post.where(F.col("pgroup").isin(pgroups))
        post = (
            post.where(F.col("term").isin(sorted(qpdf["term"].unique().tolist())))
            .select("term", "shard", "blocks")
        )
        pq = post.join(F.broadcast(qdf), "term")
        sizes = self.store.read(self.spark, "shard_sizes")
        avgdl = float(self.meta["avgdl"])
        # sound WAND pruning under avgdl drift (post-compaction) — see wand.py
        _ba = float(self.meta.get("bounds_avgdl") or avgdl) or 1.0
        self._bound_scale = max(1.0, avgdl / _ba)

        if mode == "exact":
            out = self._exact(pq, sizes, avgdl, k, rd, scoring=scoring, doc_filter=doc_filter)
        elif mode == "wand":
            if shared_theta:
                # seeding is one extra small job + a driver round-trip; it
                # only repays itself when there are enough OTHER shards for
                # the seeded threshold to prune (r5 driver bench: on the
                # 8-shard documents index it cost 2.02 s vs plain WAND's
                # 1.70 s). Below the gate the plain single-job path computes
                # the identical top-k.
                n_shards_idx = -(-int(self.meta["num_docs"]) // int(self.meta["shard_size"]))
                if n_shards_idx < SHARED_THETA_MIN_SHARDS:
                    shared_theta = False
            if shared_theta:
                seed_pdf = self._wand(
                    pq.where(F.col("shard") == 0),
                    sizes.where(F.col("shard") == 0),
                    avgdl, k, rd, scoring=scoring,
                ).toPandas()
                # a query's seed is sound only if shard 0 actually yielded a
                # FULL k (k attained scores >= its k-th) — else no floor
                theta0 = {
                    int(q): float(s.min())
                    for q, s in seed_pdf.groupby("qid")["score"]
                    if len(s) >= k
                }
                rest = self._wand(
                    pq.where(F.col("shard") != 0),
                    sizes.where(F.col("shard") != 0),
                    avgdl, k, rd, theta0, scoring=scoring,
                )
                seed_df = self.spark.createDataFrame(
                    seed_pdf, "qid int, docid bigint, score double"
                )
                out = self._global_topk(seed_df.unionAll(rest), k)
            else:
                out = self._wand(pq, sizes, avgdl, k, rd, scoring=scoring)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        return out

    def _shard_partitioned(self, pq: DataFrame) -> DataFrame:
        """Explicit hash repartition on ``shard`` ahead of the kernel stage.

        The scoring kernels are CPU-heavy Python over FEW bytes; AQE's
        byte-based partition coalescing collapses the post-join exchange to
        1-2 partitions (measured: all 33 shard groups of a 20-query batch on
        TWO Python workers — the kernel ran ~2-way parallel on a 32-core
        host). A user-specified repartition is exempt from AQE coalescing
        and the following groupBy reuses its partitioning, so the kernel
        stage keeps the configured shuffle parallelism. The partition count
        is NOT capped at the shard count: hashing s keys into only s
        buckets loses ~1/e of them to collisions (an 8-shard index would
        run ~5-way), while empty partitions cost nothing."""
        n = max(1, int(self.spark.conf.get("spark.sql.shuffle.partitions")))
        return pq.repartition(n, "shard")

    def _global_topk(self, scored: DataFrame, k: int) -> DataFrame:
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .drop("rn")
        )

    # -- exact: decode everything, relational aggregation ---------------------

    def _exact(
        self, pq: DataFrame, sizes: DataFrame, avgdl: float, k: int,
        round_decimals: int | None = None, scoring: str = "bm25",
        doc_filter: DataFrame | None = None,
    ) -> DataFrame:
        impact = scoring == "impact"

        def score_rows(postings_pdf: pd.DataFrame, dl: np.ndarray, start: int):
            qids, docids, contribs = [], [], []
            # per-row decode cache: after the query join the same postings
            # row appears once PER QID — a batch's shared (hot) terms must
            # decode once per task, not once per query. Keyed by (term,
            # first-block max_docid), NOT term alone: a compacted index
            # holds base + appended rows for the SAME (term, shard), with
            # disjoint docid ranges (so the first block's max_docid is the
            # discriminator) — a term-keyed cache would silently serve the
            # base row's postings for the appended row.
            decoded: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
            for row in postings_pdf.itertuples(index=False):
                key = (
                    row.term,
                    int(row.blocks[0]["max_docid"]) if len(row.blocks) else -1,
                )
                got = decoded.get(key)
                if got is None:
                    d_parts, t_parts, prev = [], [], -1
                    for blk in row.blocks:
                        d_, t_ = decode_block_dict(blk, prev)
                        d_parts.append(d_)
                        t_parts.append(t_)
                        prev = int(blk["max_docid"])
                    got = decoded[key] = (
                        np.concatenate(d_parts), np.concatenate(t_parts)
                    )
                d, tf = got
                if impact:  # tf IS the quantized impact; dl unused
                    c = row.idf * tf.astype(np.float64)
                else:
                    c = row.idf * tfnorm_np(tf, dl[d - start], avgdl)
                qids.append(np.full(len(d), row.qid, np.int64))
                docids.append(d)
                contribs.append(c)
            return pd.DataFrame(
                {
                    "qid": np.concatenate(qids),
                    "docid": np.concatenate(docids),
                    "contrib": np.concatenate(contribs),
                }
            )

        dlb = self._dl_broadcast()
        if dlb is not None:
            # doclengths ride a broadcast (built once per reader): the
            # shard_sizes scan + its cogroup exchange drop out of the job
            def score_shard_b(key, postings_pdf: pd.DataFrame):
                if postings_pdf.empty:
                    return pd.DataFrame({"qid": [], "docid": [], "contrib": []})
                return score_rows(postings_pdf, dlb.value, 0)

            contrib = self._shard_partitioned(pq).groupBy("shard").applyInPandas(
                score_shard_b, schema="qid int, docid bigint, contrib double"
            )
        else:
            def score_shard(key, postings_pdf: pd.DataFrame, sizes_pdf: pd.DataFrame):
                if postings_pdf.empty:
                    return pd.DataFrame({"qid": [], "docid": [], "contrib": []})
                if sizes_pdf.empty:
                    # postings exist but the shard has no doclength row: the
                    # index is corrupt — fail loud, never silently truncate
                    raise ValueError(
                        f"shard {key}: postings present but shard_sizes row missing"
                    )
                dl = np.frombuffer(sizes_pdf["dl_bin"].iloc[0], dtype="<u4")
                start = int(sizes_pdf["start_docid"].iloc[0])
                return score_rows(postings_pdf, dl, start)

            contrib = (
                pq.groupBy("shard")
                .cogroup(sizes.groupBy("shard"))
                .applyInPandas(score_shard, schema="qid int, docid bigint, contrib double")
            )
        if doc_filter is not None:
            # metadata-filtered search: semi-join the (doc, term)
            # contributions against the allowed docid set BEFORE the
            # aggregation — per-doc scores stay complete (whole docs drop)
            allowed = doc_filter.select(
                F.col(doc_filter.columns[0]).cast("long").alias("docid")
            ).distinct()
            contrib = contrib.join(allowed, "docid", "leftsemi")
        scores = contrib.groupBy("qid", "docid").agg(F.sum("contrib").alias("score"))
        if round_decimals is not None:
            # round the COMPLETE per-doc score before ranking — the sound
            # driver/oracle ordering contract (no raw-score over-fetch)
            scores = scores.select(
                "qid", "docid", F.round("score", round_decimals).alias("score")
            )
        return self._global_topk(scores, k)

    # -- wand: block-max pruned kernel per shard -------------------------------

    def _wand(
        self, pq: DataFrame, sizes: DataFrame, avgdl: float, k: int,
        round_decimals: int | None = None,
        theta0: dict[int, float] | None = None,
        scoring: str = "bm25",
    ) -> DataFrame:
        kk = int(k)
        avg = float(avgdl)
        rd = round_decimals
        sc = scoring
        # impact bounds (max_tf) are avgdl-independent — no drift inflation
        bscale = 1.0 if sc == "impact" else float(getattr(self, "_bound_scale", 1.0))

        def wand_rows(postings_pdf: pd.DataFrame, dl: np.ndarray, start: int):
            frames = []
            # per-row caches shared ACROSS the qid loop: a batch's shared
            # (hot) terms otherwise re-walk block geometry and re-decode
            # their blocks once per query — the kernel exposes geom/decode
            # cache hooks exactly for this (the serving path has used them
            # since r4; the distributed reader paid 20× per task without).
            # Keyed by (term, first-block max_docid), NOT term alone: a
            # compacted index holds base + appended rows for the SAME
            # (term, shard) with disjoint docid ranges — a term-keyed cache
            # would serve one row's blocks for the other.
            blocks_by_row: dict[tuple, list] = {}
            gc_by_row: dict[tuple, dict] = {}
            dc_by_row: dict[tuple, dict] = {}
            for qid, qg in postings_pdf.groupby("qid"):
                lists, gcs, dcs = [], [], []
                for r in qg.itertuples(index=False):
                    key = (
                        r.term,
                        int(r.blocks[0]["max_docid"]) if len(r.blocks) else -1,
                    )
                    b = blocks_by_row.get(key)
                    if b is None:
                        b = blocks_by_row[key] = list(r.blocks)
                        gc_by_row[key] = {}
                        dc_by_row[key] = {}
                    lists.append((float(r.idf), b))
                    gcs.append(gc_by_row[key])
                    dcs.append(dc_by_row[key])
                seed = theta0.get(int(qid)) if theta0 else None
                d, s = wand_topk(
                    lists, dl, start, avg, kk, rd, seed,
                    decode_caches=dcs, bound_scale=bscale, scoring=sc,
                    geom_caches=gcs,
                )
                frames.append(pd.DataFrame({"qid": int(qid), "docid": d, "score": s}))
            return pd.concat(frames, ignore_index=True)

        dlb = self._dl_broadcast()
        if dlb is not None:
            # doclengths ride a broadcast (built once per reader): the
            # shard_sizes scan + its cogroup exchange drop out of the job
            def wand_shard_b(key, postings_pdf: pd.DataFrame):
                if postings_pdf.empty:
                    return pd.DataFrame({"qid": [], "docid": [], "score": []})
                return wand_rows(postings_pdf, dlb.value, 0)

            local = self._shard_partitioned(pq).groupBy("shard").applyInPandas(
                wand_shard_b, schema="qid int, docid bigint, score double"
            )
        else:
            def wand_shard(key, postings_pdf: pd.DataFrame, sizes_pdf: pd.DataFrame):
                if postings_pdf.empty:
                    return pd.DataFrame({"qid": [], "docid": [], "score": []})
                if sizes_pdf.empty:
                    raise ValueError(
                        f"shard {key}: postings present but shard_sizes row missing"
                    )
                dl = np.frombuffer(sizes_pdf["dl_bin"].iloc[0], dtype="<u4")
                start = int(sizes_pdf["start_docid"].iloc[0])
                return wand_rows(postings_pdf, dl, start)

            local = (
                pq.groupBy("shard")
                .cogroup(sizes.groupBy("shard"))
                .applyInPandas(wand_shard, schema="qid int, docid bigint, score double")
            )
        if rd is not None:
            # canonicalize kernel-rounded doubles through the same F.round the
            # oracle contract uses (idempotent on already-rounded values)
            local = local.select("qid", "docid", F.round("score", rd).alias("score"))
        # global top-k: per-qid merge of per-shard top-k (tiny: ≤ k per shard)
        return self._global_topk(local, kk)
