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


@settings(max_examples=100, deadline=None)
@given(_TEXT)
def test_winnow_matches_duckdb(text):
    """The winnow fingerprint must agree with the SQL oracle's
    k-gram/window-min/bit_xor replay on adversarial inputs, not just the
    corpus (kernel: functions/text_analysis._winnow_one)."""
    from smart_ocr_spark.functions.text_analysis import _winnow_one

    con = duckdb.connect()
    got = _winnow_one(text)
    want = con.execute(
        """
WITH s AS (SELECT regexp_replace(lower(coalesce(?, '')),
                  '[ \\t\\n\\x0b\\f\\r]+', '', 'g') AS st),
grams AS (
  SELECT i,
    (ascii(substr(st, CAST(i AS INT), 1))::UBIGINT * 4362470401
     + ascii(substr(st, CAST(i+1 AS INT), 1))::UBIGINT * 16974593
     + ascii(substr(st, CAST(i+2 AS INT), 1))::UBIGINT * 66049
     + ascii(substr(st, CAST(i+3 AS INT), 1))::UBIGINT * 257
     + ascii(substr(st, CAST(i+4 AS INT), 1))::UBIGINT) AS g0,
    count(*) OVER () AS n
  FROM s, unnest(generate_series(1, len(st) - 4)) AS t(i)
  WHERE len(st) >= 5),
m1 AS (SELECT i, n,
  ((g0::HUGEINT + 11400714819323198485::HUGEINT)
     % 18446744073709551616::HUGEINT)::UBIGINT AS z0 FROM grams),
m2 AS (SELECT i, n,
  ((xor(z0, z0 >> 30)::HUGEINT * 4564476756301768121::HUGEINT)
     % 18446744073709551616::HUGEINT)::UBIGINT AS z1 FROM m1),
m3 AS (SELECT i, n,
  ((xor(z1, z1 >> 27)::HUGEINT * 1499779743744070123::HUGEINT)
     % 18446744073709551616::HUGEINT)::UBIGINT AS z2 FROM m2),
mixed AS (SELECT i, n, xor(z2, z2 >> 31)::HUGEINT AS g FROM m3),
wins AS (
  SELECT i, n,
    min(g) OVER (ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
      AS mn
  FROM mixed),
sel AS (SELECT DISTINCT mn FROM wins WHERE i <= greatest(n - 3, 1)),
folded AS (SELECT CAST(bit_xor(mn) >> 1 AS BIGINT) AS fp FROM sel),
short AS (
  SELECT CAST((('0x' || substr(md5(st), 1, 16))::UBIGINT >> 1) AS BIGINT)
    AS fp
  FROM s WHERE len(st) < 5)
SELECT fp FROM folded WHERE fp IS NOT NULL
UNION ALL SELECT fp FROM short
        """,
        [text],
    ).fetchone()[0]
    assert got == want, (text,)
    con.close()


@settings(max_examples=100, deadline=None)
@given(_TEXT)
def test_simhash64_matches_duckdb(text):
    """64-bit SimHash vs the SQL replay (big-endian md5 prefix, signed
    two's-complement drop) on adversarial inputs."""
    from smart_ocr_spark.functions.dedup import _simhash64_one

    con = duckdb.connect()
    got = _simhash64_one(text)
    want = con.execute(
        """
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(coalesce(?, '')),
                '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')) AS tok),
tf AS (SELECT tok, count(*) AS w FROM tok GROUP BY tok),
th AS (SELECT ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, w FROM tf),
bits AS (
  SELECT i, sum(CASE WHEN (h >> i) & 1 = 1 THEN w ELSE -w END) AS s
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
  GROUP BY i),
uv AS (
  SELECT coalesce(sum(CASE WHEN s >= 0 THEN (1::HUGEINT << i)
                           ELSE 0::HUGEINT END),
                  18446744073709551615::HUGEINT) AS v
  FROM bits)
SELECT CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
            THEN v - 18446744073709551616::HUGEINT ELSE v END AS BIGINT)
FROM uv
        """,
        [text],
    ).fetchone()[0]
    assert got == want, (text,)
    con.close()


@settings(max_examples=150, deadline=None)
@given(_TEXT, _TEXT)
def test_reconcile_total_and_stable(base, source):
    """merge_latex_into_text must never crash on arbitrary input, must
    return the base unchanged when the source has no LaTeX, and must be
    idempotent when re-merging its own output with the same source's
    non-display content absent."""
    from smart_ocr_spark.kernel.reconcile import (
        extract_latex_blocks,
        merge_latex_into_text,
    )

    merged, n = merge_latex_into_text(base, source)
    assert isinstance(merged, str) and n >= 0
    if not extract_latex_blocks(source):
        assert merged == base and n == 0
    else:
        # idempotence: the merged text already carries the source's
        # blocks, so a second merge must not change the content again
        merged2, _ = merge_latex_into_text(merged, source)
        assert merged2 == merged


_BYTES = st.binary(min_size=0, max_size=400)


@settings(max_examples=150, deadline=None)
@given(_BYTES)
def test_ruled_table_detector_never_crashes(data):
    """Adversarial content streams must never kill the parse task
    (round-3 P9 kernel; O9 malformed-input contract)."""
    from smart_ocr_spark.kernel.pdf_extract import (
        detect_ruled_table,
        extract_structured_page,
    )

    r = detect_ruled_table(data)
    assert isinstance(r, bool)
    s = extract_structured_page(data)
    assert s is None or isinstance(s, str)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.floats(-1e4, 1e4), st.floats(-1e4, 1e4),
                          st.floats(-1e4, 1e4), st.floats(-1e4, 1e4)),
                max_size=60))
def test_cluster_boxes_merge_invariants(raw_boxes):
    """Clustering always returns merged boxes covering the inputs and
    never more clusters than inputs (round-3 sweep rewrite)."""
    from smart_ocr_spark.kernel.figures import cluster_boxes

    boxes = [
        (min(a, c), min(b, d), max(a, c), max(b, d))
        for a, b, c, d in raw_boxes
    ]
    merged = cluster_boxes(boxes)
    assert len(merged) <= len(boxes)
    for x0, y0, x1, y1 in merged:
        assert x0 <= x1 and y0 <= y1
    if boxes:
        assert min(m[0] for m in merged) <= min(b[0] for b in boxes) + 1e-9
        assert max(m[2] for m in merged) >= max(b[2] for b in boxes) - 1e-9
