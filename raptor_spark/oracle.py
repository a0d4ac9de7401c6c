"""Pure-Python single-process reference extractor (the pytest oracle).

Plays the role of the missing golden outputs in the reference repo (SURVEY.md
§5: the reference ships no golden outputs). It shares the extraction core
(`raptor_spark.tokenize.extract_file`) with the Spark pandas UDF, so the
P/R ≥ 0.95 gate measures distributed-pipeline correctness (partitioning,
Arrow batching, join/agg semantics), not tokenizer drift.

Also computes golden entity-link components via a transitive-closure
union-find over the SAME candidate rule the Spark linker uses — an
independent single-process implementation of the clustering (the Spark side
uses distributed label propagation; agreement is the test).
"""

from __future__ import annotations

from collections import defaultdict

from raptor_spark.tokenize import (
    PRED_DEFINES,
    char_shingles,
    extract_file,
    jaccard,
    normalize_identifier,
)

Triple = tuple[str, str, str, str, str, int, float]


def oracle_triples(rows: list[dict]) -> list[Triple]:
    """Golden triples for a corpus: (subj, pred, obj, repo, path, line, score)."""
    out: list[Triple] = []
    for r in rows:
        out.extend(extract_file(r["repo"], r["path"], r["lang"], r["content"]))
    return out


def triple_keys(triples: list[Triple]) -> set[tuple[str, str, str]]:
    """Order-insensitive (subj, pred, obj) key set for P/R computation."""
    return {(t[0], t[1], t[2]) for t in triples}


def precision_recall(
    got: set[tuple[str, str, str]], golden: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not got or not golden:
        return (0.0, 0.0)
    inter = len(got & golden)
    return (inter / len(got), inter / len(golden))


# ---------------------------------------------------------------------------
# Golden entity linking (single-process union-find oracle)
# ---------------------------------------------------------------------------

# Linker policy constants — shared with raptor_spark.link (imported there).
JACCARD_THRESHOLD = 0.75  # ≙ reference ANN-dedup cosine 0.9 (api_insert.py:14)
HEAD_SYMBOL_MAX_DF = 0.50  # names defined in > this fraction of repos link
#                            only by exact normalized match (skew guard,
#                            SURVEY.md §7.4 risk 1)


def _canonical_names(triples: list[Triple]) -> list[str]:
    """Distinct defined symbol names (stripped of @line)."""
    names = set()
    for subj, pred, obj, *_ in triples:
        if pred == PRED_DEFINES:
            names.add(obj.split("@")[0])
    return sorted(names)


def _head_names(triples: list[Triple]) -> set[str]:
    """Names whose document frequency across repos exceeds HEAD_SYMBOL_MAX_DF."""
    repos_per_name: dict[str, set[str]] = defaultdict(set)
    all_repos: set[str] = set()
    for subj, pred, obj, repo, *_ in triples:
        all_repos.add(repo)
        if pred == PRED_DEFINES:
            repos_per_name[obj.split("@")[0]].add(repo)
    n = max(1, len(all_repos))
    return {k for k, v in repos_per_name.items() if len(v) / n > HEAD_SYMBOL_MAX_DF}


def should_link(a: str, b: str, head: set[str]) -> bool:
    """The candidate-verify rule (single source of truth for link semantics):

    * exact normalized-identifier match always links;
    * space-stripped normalized match links (``parseconfig`` ↔ ``parse_config``);
    * otherwise head symbols never fuzzy-link (skew guard);
    * otherwise link iff Jaccard(char-3-shingles of normalized) ≥ threshold
      AND the normalized first token matches (prefix block — prevents
      drive-by merges like send_request↔send_response).
    """
    na, nb = normalize_identifier(a), normalize_identifier(b)
    if na == nb:
        return True
    if na.replace(" ", "") == nb.replace(" ", ""):
        return True
    if a in head or b in head:
        return False
    ta, tb = na.split(" ")[0], nb.split(" ")[0]
    if ta != tb:
        return False
    return jaccard(char_shingles(na), char_shingles(nb)) >= JACCARD_THRESHOLD


def oracle_components(triples: list[Triple]) -> dict[str, str]:
    """name → canonical (min normalized name in its component), by exhaustive
    pairwise check + union-find. O(n²) — fine for oracle-scale corpora."""
    names = _canonical_names(triples)
    head = _head_names(triples)
    parent = {n: n for n in names}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if should_link(a, b, head):
                union(a, b)

    out: dict[str, str] = {}
    comp_members: dict[str, list[str]] = defaultdict(list)
    for n in names:
        comp_members[find(n)].append(n)
    for members in comp_members.values():
        canon = min(normalize_identifier(m) for m in members)
        for m in members:
            out[m] = canon
    return out
