"""LocalSearcher — low-latency serving over a built index, no Spark job.

Spark builds and maintains the index; serving a single query does not need a
distributed job. This reader memory-maps the term-pruned postings straight
from the index's Parquet files via pyarrow (predicate pushdown on ``term``
uses row-group statistics — the postings are written sorted by term within
each pgroup) and runs the same interval Block-Max WAND kernel the
distributed path uses. The role is exactly PISA's mmap'd query engine over
CIFF-derived indexes, re-expressed on the Spark-built artifact:

    Spark (build, refresh, heavy batch scoring)  ←  one storage layout  →
    LocalSearcher (interactive top-k, ~ms per query)

Rank-identity with both the distributed reader and the pytest oracle is
asserted in tests. Doc lengths load once from ``shard_sizes`` (the .sizes
analog); term stats load lazily per queried term.
"""

from __future__ import annotations

import glob

import numpy as np
import pyarrow.dataset as ds
import pyarrow.parquet as pq

from ciff_spark.functions.scoring import idf_np
from ciff_spark.functions.tokenizer import tokenize_py
from ciff_spark.wand import wand_topk


class LocalSearcher:
    def __init__(self, index_root: str) -> None:
        self.root = index_root.rstrip("/")
        meta = pq.read_table(f"{self.root}/meta").to_pylist()[0]
        self.num_docs = int(meta["num_docs"])
        self.avgdl = float(meta["avgdl"])
        self.shard_size = int(meta["shard_size"])
        # doclengths: one dense u32 array assembled from shard_sizes
        ss = pq.read_table(f"{self.root}/shard_sizes").to_pylist()
        self.dl = np.zeros(self.num_docs, np.uint32)
        for r in sorted(ss, key=lambda r: r["shard"]):
            a = np.frombuffer(r["dl_bin"], dtype="<u4")
            self.dl[r["start_docid"] : r["start_docid"] + r["count"]] = a
        self._postings = ds.dataset(
            glob.glob(f"{self.root}/postings/pgroup=*/*.parquet"), format="parquet"
        )
        self._stats = pq.read_table(
            f"{self.root}/term_stats", columns=["term", "df"]
        ).to_pylist()
        self._df = {r["term"]: int(r["df"]) for r in self._stats}

    def _fetch_lists(self, terms: list[str]):
        """term → (blocks ordered by shard, decode_prevs). Each shard's first
        block decodes from −1 (how it was encoded); later blocks chain on
        their predecessor's max_docid."""
        import pyarrow.compute as pc

        present = [t for t in terms if t in self._df]
        if not present:
            return {}
        tbl = self._postings.to_table(
            columns=["term", "shard", "blocks"],
            filter=pc.field("term").isin(present),
        )
        rows = sorted(tbl.to_pylist(), key=lambda r: (r["term"], r["shard"]))
        out: dict[str, tuple[list, list]] = {}
        for r in rows:
            blocks, prevs = out.setdefault(r["term"], ([], []))
            prev = -1  # shard-local chain starts at -1
            for b in r["blocks"]:
                blocks.append(b)
                prevs.append(prev)
                prev = int(b["max_docid"])
        return out

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """BM25 top-k: [(docid, score)] — identical semantics to the
        distributed readers (WAND over per-term blocks; shards of a term
        concatenate in shard order so their blocks form one valid list)."""
        terms = sorted(set(tokenize_py(query)))
        lists_by_term = self._fetch_lists(terms)
        if not lists_by_term:
            return []
        lists = [
            (float(idf_np(self._df[t], self.num_docs)), blocks, np.asarray(prevs, np.int64))
            for t, (blocks, prevs) in lists_by_term.items()
        ]
        d, s = wand_topk(lists, self.dl, 0, self.avgdl, k)
        return list(zip(d.tolist(), s.tolist()))
