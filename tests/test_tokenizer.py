"""Tokenizer contract tests: the four implementations must agree exactly
(FIXTURES.md §4 'tokenizer edge cases')."""

import duckdb
import pytest

from ciff_spark.functions.tokenizer import TOKENIZE_SQL, tokenize_py

CASES = [
    "",
    "   ",
    "Hello, World!",
    "a",
    "CamelCase and UPPER and 42x7 mixed-99",
    "....!!!???",
    "tabs\tand\nnewlines\r\nand  double  spaces",
    "unicode élan naïve 北京 stays-ascii-only",
    "trailing sep ",
    " leading sep",
    "x" * 5000,
    "0 00 000 a0 0a",
]


@pytest.mark.parametrize("text", CASES)
def test_python_vs_duckdb(text):
    con = duckdb.connect()
    (got,) = con.execute(
        f"SELECT {TOKENIZE_SQL} FROM (SELECT ? AS text)", [text]
    ).fetchone()
    assert got == tokenize_py(text)


def test_none_and_empty():
    assert tokenize_py(None) == []
    assert tokenize_py("") == []


def test_pinned_semantics():
    assert tokenize_py("Hello, World 42x") == ["hello", "world", "42x"]
    # non-ascii letters are separators by the pinned ASCII contract
    assert tokenize_py("élan") == ["lan"]
