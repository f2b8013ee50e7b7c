"""Repo-wide duplicate-literal-dict-key lint (ADVICE r14).

A Python dict display silently keeps the LAST duplicate key — exactly
how `REVERIFY_SINCE` shadowed q9's r13 entry with the r14 one (and the
reversed order would have silently LOST the newer round).  flake8's
B035 isn't in this container, so walk the ASTs ourselves: every dict
literal with constant keys must have unique keys.

Pure stdlib; no SparkSession.
"""

from __future__ import annotations

import ast
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SOURCES = ["hfp_loader_spark", "tools", "bench.py", "__spark_entry__.py"]


def _py_files():
    for src in SOURCES:
        path = os.path.join(REPO, src)
        if os.path.isfile(path):
            yield path
        else:
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".py"):
                        yield os.path.join(root, f)


def _duplicate_keys(tree: ast.AST):
    for node in ast.walk(tree):
        if not isinstance(node, ast.Dict):
            continue
        seen: set = set()
        for key in node.keys:
            if key is None:  # **spread
                continue
            if isinstance(key, ast.Constant):
                try:
                    k = key.value
                    hash(k)
                except TypeError:  # pragma: no cover — unhashable const
                    continue
                if k in seen:
                    yield node.lineno, k
                seen.add(k)


def test_no_duplicate_literal_dict_keys():
    offenders = []
    for path in _py_files():
        with open(path, encoding="utf-8") as fh:
            try:
                tree = ast.parse(fh.read(), filename=path)
            except SyntaxError as e:  # pragma: no cover
                pytest.fail(f"{path}: unparseable: {e}")
        for lineno, key in _duplicate_keys(tree):
            offenders.append(f"{os.path.relpath(path, REPO)}:{lineno}: {key!r}")
    assert not offenders, "duplicate literal dict keys:\n" + "\n".join(offenders)


def test_detects_a_planted_duplicate():
    """The walker itself must catch the REVERIFY_SINCE failure shape."""
    tree = ast.parse("x = {'q9': 13, 'q1': 14, 'q9': 14}")
    found = list(_duplicate_keys(tree))
    assert found == [(1, "q9")]
