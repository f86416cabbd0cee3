"""Single-node reference oracle: pure Python/NumPy indexer + BM25 top-k.

Plays the role the golden toy CIFF file plays in the reference's tests
(/root/reference/tests/toy.rs:9-86): an independently-computed ground truth.
Shares ONLY the pinned semantic modules (tokenizer, scoring) with the engine —
all indexing/scoring logic here is a separate, trivially-auditable
implementation (dicts and loops, no Spark).

Semantics pinned here and mirrored by the engine:
- docid = rank of the document key (e.g. (conv_id, turn_idx)) ascending;
- doclength = total token count (Σtf), NOT the reference's jsonl2ciff
  unique-terms quirk (SURVEY §1.3);
- query terms are deduplicated; score accumulation iterates terms in
  lexicographic order (pins f64 summation order);
- top-k orders by (-score, docid).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from ciff_spark.functions.scoring import idf_np, tfnorm_np
from ciff_spark.functions.tokenizer import tokenize_py


class OracleIndex:
    def __init__(self) -> None:
        self.docs: pd.DataFrame | None = None  # docid + id cols + doclength
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.num_docs: int = 0
        self.total_terms: int = 0
        self.avgdl: float = 0.0

    @classmethod
    def build(
        cls,
        pdf: pd.DataFrame,
        id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
        text_col: str = "text",
    ) -> "OracleIndex":
        idx = cls()
        ordered = pdf.sort_values(list(id_cols), kind="mergesort").reset_index(drop=True)
        doclengths = []
        for docid, text in enumerate(ordered[text_col].tolist()):
            toks = tokenize_py(text)
            doclengths.append(len(toks))
            for term, tf in sorted(Counter(toks).items()):
                idx.postings.setdefault(term, []).append((docid, tf))
        idx.docs = ordered[list(id_cols)].copy()
        idx.docs.insert(0, "docid", np.arange(len(ordered), dtype=np.int64))
        idx.docs["doclength"] = np.array(doclengths, dtype=np.int64)
        idx.num_docs = len(ordered)
        idx.total_terms = int(sum(doclengths))
        idx.avgdl = idx.total_terms / idx.num_docs if idx.num_docs else 0.0
        return idx

    # -- statistics (≙ CIFF Header / PostingsList stats) ---------------------

    def term_stats(self) -> pd.DataFrame:
        rows = [
            (term, len(plist), int(sum(tf for _, tf in plist)))
            for term, plist in sorted(self.postings.items())
        ]
        return pd.DataFrame(rows, columns=["term", "df", "cf"])

    # -- query ----------------------------------------------------------------

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """BM25 top-k: list of (docid, score), score desc, docid asc."""
        terms = sorted(set(tokenize_py(query)))
        dl = self.docs["doclength"].to_numpy()
        scores: dict[int, float] = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = float(idf_np(len(plist), self.num_docs))
            docids = np.array([d for d, _ in plist], dtype=np.int64)
            tfs = np.array([t for _, t in plist], dtype=np.float64)
            contrib = idf * tfnorm_np(tfs, dl[docids], self.avgdl)
            for d, s in zip(docids.tolist(), contrib.tolist()):
                scores[d] = scores.get(d, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
