"""Property-based parity guards (hypothesis): the tokenization and
shingling used by the Python kernels must agree with the DuckDB SQL the
oracles use, over adversarial ASCII inputs — whitespace runs, empties,
punctuation. A silent divergence here would make every dedup oracle
flaky on future corpora."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from smart_ocr_spark.functions.dedup import _shingle_set, _tokenize

# ASCII incl. every whitespace class character the regexes name
_ALPHABET = st.sampled_from(
    list("abcXYZ09.,;:!?'\"()-/\\$%&") + [" ", "\t", "\n", "\x0b", "\f", "\r"]
)
_TEXT = st.text(alphabet=_ALPHABET, min_size=0, max_size=120)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@settings(max_examples=200, deadline=None)
@given(_TEXT)
def test_tokenizer_matches_duckdb(text):
    con = duckdb.connect()
    got = _tokenize(text)
    want = con.execute(
        "SELECT list_filter(regexp_split_to_array(lower(?), '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')",
        [text],
    ).fetchone()[0]
    assert got == list(want), (text,)
    con.close()


@settings(max_examples=100, deadline=None)
@given(_TEXT)
def test_shingles_match_duckdb(text):
    con = duckdb.connect()
    got = sorted(_shingle_set(text))
    want = con.execute(
        """
        SELECT list_sort(list_distinct(
          CASE WHEN len(t) >= 3 THEN
            list_transform(generate_series(1, len(t) - 2),
                           i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
          ELSE [] END))
        FROM (SELECT list_filter(regexp_split_to_array(lower(?), '[ \\t\\n\\x0b\\f\\r]+'),
                                 x -> x <> '') AS t)
        """,
        [text],
    ).fetchone()[0]
    assert got == sorted(want), (text,)
    con.close()


@settings(max_examples=100, deadline=None)
@given(_TEXT)
def test_normalize_idempotent(text):
    from smart_ocr_spark.kernel.normalize import normalize

    once = normalize(text)
    assert normalize(once) == once
