"""Gate (c) from FIXTURES.md §4: entity-linking correctness."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from raptor_spark.cc import connected_components
from raptor_spark.link import canonical_mapping, head_names, defined_names, link_edges
from raptor_spark.oracle import oracle_components, oracle_triples
from raptor_spark.synth import ALIAS_CLUSTERS, HEAD_SYMBOLS


@pytest.fixture(scope="module")
def mapping(triples_df):
    comps = connected_components(link_edges(triples_df))
    return {
        r.name: r.canonical for r in canonical_mapping(triples_df, comps).collect()
    }


def test_alias_clusters_merge(mapping):
    for cluster in ALIAS_CLUSTERS:
        present = [c for c in cluster if c in mapping]
        if len(present) >= 2:
            assert len({mapping[c] for c in present}) == 1, cluster


def test_disjoint_symbols_do_not_merge(mapping):
    # distinct alias clusters land in distinct components
    canons = set()
    for cluster in ALIAS_CLUSTERS:
        present = [c for c in cluster if c in mapping]
        if present:
            c = mapping[present[0]]
            assert c not in canons, f"cluster {cluster} merged into another"
            canons.add(c)


def test_head_symbols_stay_singletons(mapping):
    # main / utils / init must not fuzzy-merge with anything or each other
    assert len({mapping[h] for h in HEAD_SYMBOLS if h in mapping}) == len(
        [h for h in HEAD_SYMBOLS if h in mapping]
    )
    for h in HEAD_SYMBOLS:
        if h in mapping:
            assert mapping[h] == h


def test_no_giant_component(mapping):
    from collections import Counter

    sizes = Counter(mapping.values())
    biggest = sizes.most_common(1)[0]
    assert biggest[1] <= 16, f"giant component: {biggest}"


def test_matches_exhaustive_oracle(mapping, corpus_rows):
    golden = oracle_components(oracle_triples(corpus_rows))
    assert set(mapping) == set(golden)
    agree = sum(1 for k in golden if mapping[k] == golden[k])
    assert agree / len(golden) >= 0.98, f"agreement {agree / len(golden):.3f}"


def test_head_detection(triples_df):
    heads = {r.name for r in head_names(defined_names(triples_df)).collect()}
    assert set(HEAD_SYMBOLS) <= heads
    assert "fetchData" not in heads


def test_name_features_matches_legacy_path(triples_df):
    # the fused one-shuffle name_features must flag exactly the names the
    # legacy defined_names -> head_names chain flags, over exactly the same
    # distinct-name universe
    from raptor_spark.link import name_features

    feats = name_features(triples_df).select("name", "is_head").collect()
    got_names = {r.name for r in feats}
    got_heads = {r.name for r in feats if r.is_head}
    names_repo = defined_names(triples_df)
    want_names = {r.name for r in names_repo.select("name").distinct().collect()}
    want_heads = {r.name for r in head_names(names_repo).collect()}
    assert got_names == want_names
    assert got_heads == want_heads
