"""Skew handling: explicit key salting (north_rule requirement, alongside
AQE's runtime skew-join).

The reference hides skew in Kafka partition counts (create_topic.sh: video
topics get 12 partitions, documents 6); Spark surfaces it as hot keys in
shuffles. AQE's skew-join splits oversized partitions at runtime, but only
for sort-merge joins it can see — explicit salting is the deterministic tool
when the skew is structural and known (head symbols, low-cardinality
dimension keys).

* salted_join   — big-side rows get a content-derived salt in [0, n_salts);
                  the small side is exploded across all salts; the join key
                  becomes (key, salt), spreading each hot key over n_salts
                  reducers. Semantics identical to the unsalted equi-join.
* salt_col      — the salt expression: pmod(xxhash64(content cols), n) —
                  content-derived (never monotonically_increasing_id /
                  rand(), SURVEY.md §7.4 determinism risk).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salt_col(cols: list[str | Column], n_salts: int) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small on keys`` with the hot-key shuffle spread over
    ``n_salts`` sub-keys. ``small`` is replicated n_salts× (explode), so use
    only when small is actually small — the same size regime where broadcast
    would also work; salting is the fallback when the small side exceeds the
    broadcast threshold but the BIG side's keys are too skewed for a plain
    shuffle join.

    Limitation: the salt is derived from the big side's NON-key columns
    (determinism: content-derived, never rand()). If the big side consists
    of ONLY the key columns, every duplicate of a hot key is byte-identical
    and hashes to one salt — no spread. There is no deterministic way to
    distinguish identical rows; de-duplicate-and-count first, or add a
    disambiguating column, before salting such inputs."""
    salt_source = [c for c in big.columns if c not in on] or on
    b = big.withColumn(SALT, salt_col(salt_source, n_salts))
    s = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, on=[*on, SALT], how=how).drop(SALT)
