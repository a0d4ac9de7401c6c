"""Reusable column-expression helpers (JVM-side, codegen-friendly).

These mirror pure-Python functions in ``raptor_spark.tokenize`` where both
sides must agree bit-for-bit (tested in tests/test_functions.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from raptor_spark.schemas import N_REPO_BUCKETS


def sha256_col(c: Column | str) -> Column:
    """Per-row content invariant — identical to tokenize.sha256_hex."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sha2(F.coalesce(c, F.lit("")), 256)


def norm_identifier_col(c: Column | str) -> Column:
    """JVM-side replica of tokenize.normalize_identifier:
    camel/Pascal/snake/kebab → lowercase space-separated tokens."""
    c = F.col(c) if isinstance(c, str) else c
    s = F.regexp_replace(c, r"([a-z0-9])([A-Z])", r"$1 $2")
    s = F.regexp_replace(s, r"([A-Z]+)([A-Z][a-z])", r"$1 $2")
    s = F.regexp_replace(s, r"[_\-]+", " ")
    s = F.lower(F.trim(s))
    return F.regexp_replace(s, r"\s+", " ")


def repo_bucket_col(c: Column | str, n: int = N_REPO_BUCKETS) -> Column:
    """Deterministic bucket for partition spec (≙ Iceberg bucket transform)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.pmod(F.xxhash64(c), F.lit(n)).cast("int")


def node_id_col(kind: Column | str, canonical: Column | str) -> Column:
    """Stable node id = sha2(kind || ':' || canonical) (FIXTURES.md §2)."""
    kind = F.lit(kind) if isinstance(kind, str) else kind
    canonical = F.col(canonical) if isinstance(canonical, str) else canonical
    return F.sha2(F.concat_ws(":", kind, canonical), 256)


def bind_col(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE per row and feed it to ``fn`` as a lambda
    variable. Higher-order-function lambdas get no common-subexpression
    elimination, so inlining an expensive expression (a regex split, a
    shingle array) into a lambda body re-evaluates it at EVERY reference —
    measured 16× on the shingling hot path (see
    operators/dedup.word_shingles_col). ``transform`` over a one-element
    array evaluates its input a single time."""
    return F.element_at(F.transform(F.array(col), fn), 1)
