"""Replay the reference's OWN test matrix against our kernels.

The manual parity suites (test_normalize.py etc.) mirror the reference
tests by hand; this harness removes the transcription risk for the one
module with a clean functional seam: every test body in the reference's
``tests/test_normalizer.py`` whose only dependency is the ``_n(text,
engine)`` helper is executed VERBATIM with ``_n`` bound to our
``kernel.normalize.normalize``.  Tests that touch reference-only
classes (OutputNormalizer internals, filesystem fixtures) raise
non-assertion errors and are counted as skipped.

Skips cleanly when the reference checkout is absent (the repo must
remain standalone).
"""

from __future__ import annotations

import ast
import os
import re

import pytest

REF_TESTS = "/root/reference/tests/test_normalizer.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_TESTS), reason="reference checkout not present"
)


def _collect_cases():
    tree = ast.parse(open(REF_TESTS).read())
    return [
        node
        for node in ast.walk(tree)
        if isinstance(node, ast.FunctionDef) and node.name.startswith("test")
    ]


def test_reference_normalizer_matrix_passes_verbatim():
    from smart_ocr_spark.kernel.normalize import normalize

    def _n(text, engine=""):
        return normalize(text, engine)

    passed, failures, skipped = 0, [], 0
    for node in _collect_cases():
        body = ast.Module(body=node.body, type_ignores=[])
        code = compile(body, f"<ref:{node.name}>", "exec")
        try:
            exec(code, {"_n": _n, "re": re, "self": None})
            passed += 1
        except AssertionError as e:
            failures.append((node.name, str(e)[:200]))
        except Exception:
            skipped += 1  # reference-only classes/fixtures
    assert not failures, failures
    # the functional subset must not silently shrink (42 at last audit)
    assert passed >= 42, f"only {passed} reference cases ran ({skipped} skipped)"
