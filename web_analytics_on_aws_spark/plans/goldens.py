"""Independent-reference goldens for iterative (non-SQL-expressible) ops.

BPE training is a loop — no single ANSI-SQL statement expresses it. The
driver contract still wants a DuckDB-checkable oracle, so these helpers
compute the expected output with a PURE-PYTHON reference implementation
(reading the same parquet through pyarrow — no Spark anywhere in the path)
and emit it as a ``VALUES``-literal SQL statement. The check stays a real
differential test: an independent reimplementation of the semantics, run on
the same input, compared value-exactly — the same pattern as
tests/test_corpus_ops.py's ``_ref_bpe``, but routed through the driver gate.

The oracle callables are resolved lazily (plans.resolve_oracles) and read
the scale-factor directory from ``SPARK_GRAFT_GOLDEN_SF_DIR`` (default: the
driver's sf0.01) so the same goldens serve pytest at sf0.001 and the driver
at sf0.01. Results are memoized per (path, params).
"""

from __future__ import annotations

import os
import re
from collections import Counter
from functools import lru_cache

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def _sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_GOLDEN_SF_DIR", DEFAULT_SF_DIR)


@lru_cache(maxsize=4)
def _load_docs(sf_dir: str) -> tuple[tuple[int, str], ...]:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    return tuple(zip(t.column("doc_id").to_pylist(),
                     t.column("text").to_pylist()))


def _words(text: str) -> list[str]:
    # token_split semantics: trim, split on runs of spaces.
    return [w for w in re.split(r" +", text.strip()) if w != ""]


def _merge_word(syms: list[str], a: str, b: str, m: str) -> list[str]:
    # The trainer/encoder's greedy left-to-right fold: scan symbols, merge
    # (acc[-1]==a, s==b) pairs non-overlapping as encountered.
    acc: list[str] = []
    for s in syms:
        if acc and acc[-1] == a and s == b:
            acc[-1] = m
        else:
            acc.append(s)
    return acc


def _ref_bpe_train(
    docs: tuple[tuple[int, str], ...], n_merges: int, min_pair_count: int = 2
) -> list[tuple[int, str, str, str, int]]:
    vocab = Counter()
    for _, text in docs:
        vocab.update(_words(text))
    words: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in vocab.items()
    ]
    merges: list[tuple[int, str, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, cnt in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        (a, b), pc = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if pc < min_pair_count:
            break
        m = a + b
        merges.append((rnd, a, b, m, pc))
        words = [(_merge_word(syms, a, b, m), cnt) for syms, cnt in words]
    return merges


def _ref_bpe_encode(
    text: str, rules: list[tuple[str, str, str]]
) -> list[str]:
    wsyms = [list(w) for w in _words(text)]
    for a, b, m in rules:
        wsyms = [_merge_word(ws, a, b, m) for ws in wsyms]
    return [s for ws in wsyms for s in ws]


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@lru_cache(maxsize=8)
def _train_rows(sf_dir: str, n_merges: int) -> tuple:
    return tuple(_ref_bpe_train(_load_docs(sf_dir), n_merges))


def bpe_train_oracle(n_merges: int = 20):
    """Lazy oracle: VALUES-literal of the pure-Python reference's merges."""

    def resolve() -> str:
        rows = _train_rows(_sf_dir(), n_merges)
        if not rows:
            return (
                "SELECT CAST(NULL AS INT) AS round, CAST(NULL AS VARCHAR) AS left_sym,"
                " CAST(NULL AS VARCHAR) AS right_sym, CAST(NULL AS VARCHAR) AS merged,"
                " CAST(NULL AS BIGINT) AS pair_count WHERE FALSE"
            )
        vals = ",\n".join(
            f"({rnd}, {_sql_str(a)}, {_sql_str(b)}, {_sql_str(m)}, {pc})"
            for rnd, a, b, m, pc in rows
        )
        return (
            "SELECT CAST(round AS INT) AS round, left_sym AS \"left\","
            " right_sym AS \"right\", merged,"
            " CAST(pair_count AS BIGINT) AS pair_count FROM (VALUES\n"
            f"{vals}\n) AS t(round, left_sym, right_sym, merged, pair_count)"
        )

    return resolve


def bpe_encode_oracle(n_merges: int = 12, sample: int = 50, head: int = 8):
    """Lazy oracle: reference-encode the first ``sample`` docs (by doc_id)
    with merges trained on the full corpus; emit (doc_id, n_tokens,
    head_tokens) with head_tokens space-joined for hashability."""

    def resolve() -> str:
        sf = _sf_dir()
        docs = _load_docs(sf)
        rules = [(a, b, m) for _, a, b, m, _ in _train_rows(sf, n_merges)]
        rows = []
        for doc_id, text in sorted(docs)[:sample]:
            toks = _ref_bpe_encode(text, rules)
            rows.append((doc_id, len(toks), " ".join(toks[:head])))
        vals = ",\n".join(
            f"({i}, {n}, {_sql_str(h)})" for i, n, h in rows
        )
        return (
            "SELECT CAST(doc_id AS BIGINT) AS doc_id,"
            " CAST(n_tokens AS INT) AS n_tokens, head_tokens FROM (VALUES\n"
            f"{vals}\n) AS t(doc_id, n_tokens, head_tokens)"
        )

    return resolve


# ------------------------------------------------------------- whitening


@lru_cache(maxsize=4)
def _load_embeddings(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    m = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()]
    )
    return m


def _ref_pca_whiten_audit(m, k: int):
    """Independent numpy reference of operators/embeddings.py: fit the
    top-k PCA whitener (same /n covariance convention, same canonical
    sign rule) and audit the whitened matrix. Thresholds are 6 orders of
    magnitude above float noise, so engine summation order cannot flip a
    boolean or a 6-dp rounding."""
    import numpy as np

    n, _d = m.shape
    mean = m.mean(axis=0)
    c = (m.T @ m) / n - np.outer(mean, mean)
    lam, vec = np.linalg.eigh(c)
    order = np.argsort(lam)[::-1][:k]
    lam_k, v_k = lam[order], vec[:, order]
    for j in range(k):
        i = int(np.argmax(np.abs(v_k[:, j])))
        if v_k[i, j] < 0:
            v_k[:, j] = -v_k[:, j]
    w = (v_k / np.sqrt(lam_k)).T  # k×d
    y = (m - mean) @ w.T
    my = y.mean(axis=0)
    cy = (y.T @ y) / n - np.outer(my, my)
    off = np.abs(cy - np.diag(np.diag(cy)))
    total = float(lam.sum())
    rows = []
    for j in range(k):
        rows.append(
            (
                j,
                round(float(lam_k[j]), 6),
                round(float(lam_k[j] / total), 6),
                bool(abs(my[j]) < 1e-9),
                bool(abs(cy[j, j] - 1.0) < 1e-6),
                bool(off[j].max() < 1e-6),
            )
        )
    return rows


def pca_whiten_audit_sql(k: int = 8):
    """Lazy oracle: VALUES-literal of the numpy reference's audit rows."""

    def build() -> str:
        rows = _ref_pca_whiten_audit(_load_embeddings(_sf_dir()), k)
        vals = ",\n".join(
            f"({c}, {ev!r}, {ex!r}, {m}, {v}, {d})"
            for c, ev, ex, m, v, d in rows
        )
        return (
            "SELECT CAST(comp AS INT) AS comp,"
            " CAST(eigval AS DOUBLE) AS eigval,"
            " CAST(explained AS DOUBLE) AS explained,"
            " CAST(mean_ok AS BOOLEAN) AS mean_ok,"
            " CAST(unit_var_ok AS BOOLEAN) AS unit_var_ok,"
            " CAST(decorrelated_ok AS BOOLEAN) AS decorrelated_ok"
            " FROM (VALUES\n" + vals +
            "\n) AS t(comp, eigval, explained, mean_ok, unit_var_ok,"
            " decorrelated_ok)"
        )

    return build
