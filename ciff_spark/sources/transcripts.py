"""Deterministic synthetic multi-turn transcript generator (FIXTURES.md §1).

Schema is exactly BASELINE.json's ``input_hint``:
    conv_id: string, turn_idx: int, role: string, text: string,
    tool: string, ts: timestamp

Every row is a pure function of ``(seed, conversation index)`` — independent of
partitioning, executor count, or row order — so the Spark-generated table and
the locally generated pandas table are row-identical (the oracle builds from
the same rows the engine indexes), and a regenerated bench input is always the
same input. Vocabulary is Zipf(s=1.1) over 10k synthetic words: the top words
land in most documents, which is what exercises the hot-term shard handling.

One turn = one document; dense docid = rank of (conv_id, turn_idx) — the
distributed analog of the reference's dense 0..N-1 DocRecord contract
(/root/reference/src/lib.rs:545-547).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

VOCAB_SIZE = 10_000
ZIPF_S = 1.1
MAX_TURNS = 40
BASE_TS = np.datetime64("2026-01-01T00:00:00")

TOOLS = [
    "search", "calculator", "python", "browser", "sql",
    "filesystem", "email", "calendar", "weather", "maps",
]

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

_VOCAB_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _get_vocab(vocab_size: int) -> tuple[np.ndarray, np.ndarray]:
    """(word array, Zipf CDF) for a vocabulary size — cached per process.
    The default 10k vocab is the pinned oracle-parity corpus; larger sizes
    exist for the vocabulary-scale benchmark (realistic term cardinality)."""
    if vocab_size not in _VOCAB_CACHE:
        width = max(6, len(str(vocab_size - 1)))
        words = np.char.add("w", np.char.zfill(np.arange(vocab_size).astype(str), width))
        p = 1.0 / np.arange(1, vocab_size + 1) ** ZIPF_S
        _VOCAB_CACHE[vocab_size] = (words, np.cumsum(p / p.sum()))
    return _VOCAB_CACHE[vocab_size]


_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _conv_rows(conv_index: int, seed: int, vocab_size: int = VOCAB_SIZE) -> list[tuple]:
    """All turns of one conversation — pure function of (seed, conv_index)."""
    # golden-ratio seed mix, intentionally wrapping mod 2^64
    mixed = (seed * 0x9E3779B97F4A7C15 + conv_index) % (1 << 64)
    rng = np.random.default_rng(np.uint64(mixed))
    vocab, cdf = _get_vocab(vocab_size)
    n_turns = int(min(1 + rng.geometric(0.18), MAX_TURNS))
    rows = []
    conv_id = f"conv{conv_index:08d}"
    base_min = conv_index * MAX_TURNS
    for t in range(n_turns):
        n_tok = int(3 + rng.integers(0, 118))
        words = vocab[np.searchsorted(cdf, rng.random(n_tok))]
        # ~1% noise: uppercase a word or glue punctuation, exercising the tokenizer
        noise = rng.random(n_tok)
        words = [
            w.upper() if nz < 0.005 else (w + ",") if nz < 0.01 else w
            for w, nz in zip(words.tolist(), noise)
        ]
        is_tool = rng.random() < 0.10 and t > 0
        role = "tool" if is_tool else ("user" if t % 2 == 0 else "assistant")
        tool = TOOLS[int(rng.integers(0, len(TOOLS)))] if is_tool else None
        rows.append(
            (conv_id, t, role, " ".join(words), tool,
             BASE_TS + np.timedelta64(60 * (base_min + t), "s"))
        )
    return rows


def _rows_to_pdf(rows: list[tuple]) -> pd.DataFrame:
    pdf = pd.DataFrame(rows, columns=_COLS)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf


def transcripts_pdf(n_convs: int, seed: int = 42, vocab_size: int = VOCAB_SIZE) -> pd.DataFrame:
    """Local (oracle-side) generation — identical rows to ``transcripts_df``."""
    rows: list[tuple] = []
    for i in range(n_convs):
        rows.extend(_conv_rows(i, seed, vocab_size))
    return _rows_to_pdf(rows)


def transcripts_df(
    spark: SparkSession, n_convs: int, seed: int = 42, partitions: int | None = None,
    vocab_size: int = VOCAB_SIZE,
) -> DataFrame:
    """Distributed generation: one task per conv range, rows identical to
    ``transcripts_pdf`` regardless of ``partitions``."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(iterator):
        for pdf in iterator:
            rows: list[tuple] = []
            for conv_index in pdf["id"].tolist():
                rows.extend(_conv_rows(int(conv_index), seed, vocab_size))
            if rows:
                yield _rows_to_pdf(rows)

    return (
        spark.range(0, n_convs, numPartitions=partitions)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )
