"""Pinned BM25 scoring — one module used by the engine, the pytest oracle,
and the generated DuckDB oracle SQL, so rank-identity holds by construction.

Formula (the classic Robertson/PISA variant; the reference repo itself ships
no scorer — CIFF only carries the statistics a scorer needs, see
/root/reference/proto/common-index-format-v1.proto:10-34):

    idf(t)      = ln((N - df(t) + 0.5) / (df(t) + 0.5))
    tfnorm(d,t) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl(d) / avgdl))
    score(q,d)  = sum over t in q of idf(t) * tfnorm(d, t)

with k1 = 0.9, b = 0.4 pinned by BASELINE.json's north_star. ``idf`` may be
negative for terms in more than half the collection (Zipf-hot terms) — kept
as-is, identically everywhere. Ties in top-k are broken by ascending docid.
Driver-facing outputs round scores to ``SCORE_DECIMALS`` in BOTH engines so
cross-engine f64 ulp noise cannot flip the order-insensitive value hash.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

K1: float = 0.9
B: float = 0.4
#: Decimal places for driver-facing score rounding (oracle hash stability).
SCORE_DECIMALS: int = 6


# ---------------------------------------------------------------------------
# NumPy (oracle + WAND kernel side)
# ---------------------------------------------------------------------------

def idf_np(df: np.ndarray | float, num_docs: int) -> np.ndarray | float:
    return np.log((num_docs - df + 0.5) / (df + 0.5))


def tfnorm_np(
    tf: np.ndarray, doclen: np.ndarray, avgdl: float,
    k1: float = K1, b: float = B,
) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doclen, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def tfnorm_upper_bound(max_tf: float, k1: float = K1, b: float = B) -> float:
    """Sup of tfnorm over all doc lengths (dl -> 0): a true bound from tf alone."""
    return max_tf * (k1 + 1.0) / (max_tf + k1 * (1.0 - b))


# ---------------------------------------------------------------------------
# Spark Column expressions (relational exact-scoring path)
# ---------------------------------------------------------------------------

def idf_col(df_col: Column, num_docs: Column | int) -> Column:
    n = F.lit(num_docs) if isinstance(num_docs, int) else num_docs
    return F.log((n.cast("double") - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)))


def tfnorm_col(tf_col: Column, dl_col: Column, avgdl: Column | float,
               k1: float = K1, b: float = B) -> Column:
    a = F.lit(avgdl) if isinstance(avgdl, float) else avgdl
    tf = tf_col.cast("double")
    return tf * F.lit(k1 + 1.0) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_col.cast("double") / a)
    )


# ---------------------------------------------------------------------------
# SQL fragments (DuckDB driver oracle) — generated from the same constants
# ---------------------------------------------------------------------------

def idf_sql(df_expr: str, num_docs_expr: str) -> str:
    return f"ln(({num_docs_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5))"


def tfnorm_sql(tf_expr: str, dl_expr: str, avgdl_expr: str,
               k1: float = K1, b: float = B) -> str:
    return (
        f"({tf_expr} * {k1 + 1.0!r} / "
        f"({tf_expr} + {k1!r} * ({1.0 - b!r} + {b!r} * {dl_expr} / {avgdl_expr})))"
    )
