"""Hypothesis property tests for the pure-python kernels that mirror
engine semantics: the graph module's distance math vs numpy, shingle UDF
logic vs the Catalyst expression, and the portable hash contract."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_index_spark.index.graph import ShardGraph, build_shard_graph, query_shard

TOKEN_RE = re.compile("[^a-z0-9]+")


@st.composite
def matrices(draw):
    n = draw(st.integers(min_value=2, max_value=40))
    d = draw(st.integers(min_value=2, max_value=8))
    data = draw(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            min_size=n * d,
            max_size=n * d,
        )
    )
    return np.array(data, dtype=np.float64).reshape(n, d)


@settings(max_examples=25, deadline=None)
@given(matrices())
def test_graph_query_includes_exact_nn_with_full_patience(X):
    """With unbounded patience the beam search degenerates to exhaustive
    search on a connected graph: the true nearest neighbor must be in the
    top-k (the relaxed_monotonicity=0 contract, dehnsw.h:300-307 — the
    patience branch never fires)."""
    n = len(X)
    g = build_shard_graph(X, np.arange(n), connect=4, patience=0, step=2)
    q = X[0] + 0.001
    d = ((X - q) ** 2).sum(axis=1)
    true_nn = int(np.lexsort((np.arange(n), d))[0])
    res = [off for _, off in query_shard(g, q, min(5, n), patience=0)]
    assert true_nn in res


@settings(max_examples=50, deadline=None)
@given(matrices())
def test_shard_graph_dist_matches_numpy(X):
    g = ShardGraph(X=X, ids=np.arange(len(X)))
    a, b = 0, len(X) - 1
    expect = float(((X[a] - X[b]) ** 2).sum())
    assert math.isclose(g.dist(a, b), expect, rel_tol=1e-12, abs_tol=1e-12)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_python_tokenizer_never_emits_empty_tokens(text):
    toks = [t for t in TOKEN_RE.split(text.lower()) if t]
    assert all(toks)
    assert all(re.fullmatch("[a-z0-9]+", t) for t in toks)


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=50), st.integers(min_value=0, max_value=15))
def test_portable_hash_contract(s, seed):
    """48-bit md5 prefix: non-negative, < 2^48, deterministic, and equal to
    the int-of-hex-prefix definition used by the DuckDB oracles."""
    payload = f"{seed}:{s}".encode()
    via_bytes = int.from_bytes(hashlib.md5(payload).digest()[:6], "big")
    via_hex = int(hashlib.md5(payload).hexdigest()[:12], 16)
    assert via_bytes == via_hex
    assert 0 <= via_bytes < 2**48
