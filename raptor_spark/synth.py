"""Deterministic synthetic source-code corpus generator (seed=42).

Produces rows of exactly the BASELINE.json input_hint shape
``(repo, path, commit, lang, content)`` with planted ground truth per
FIXTURES.md §1: imports, defs with line numbers, calls inside def bodies,
concept terms at controlled densities, cross-repo alias clusters
(fooBar/foo_bar/FooBar), head-symbol skew (main/utils/init in ≥80% of repos),
and edge cases (empty / whitespace-only / multi-MB / weird-bytes / duplicate
content files).

The generator stands in for the reference's ingest surface (lakeFS asset store,
raptor/asset_management/) — in production the input is an Iceberg table; here
we synthesize it at small scale (no external data).
"""

from __future__ import annotations

import hashlib
import random

CONCEPT_WORDS = [
    "parser", "cache", "http", "auth", "database", "queue",
    "hash", "logger", "socket", "json",
]
FILLER_WORDS = [
    "value", "result", "item", "record", "count", "total", "buffer",
    "state", "config", "context", "worker", "batch", "stream",
]
MODULES = [
    "os", "sys", "json", "collections", "itertools", "functools",
    "pkg.core", "pkg.io", "pkg.net", "lib.common",
]
# Alias clusters: each inner tuple is one logical symbol spelled differently
# across repos — ground truth for MinHash/LSH + connected-components linking.
ALIAS_CLUSTERS: list[tuple[str, ...]] = [
    ("fetchData", "fetch_data", "FetchData"),
    ("parseConfig", "parse_config", "ParseConfig", "parseconfig"),
    ("buildIndex", "build_index", "BuildIndex"),
    ("sendRequest", "send_request", "SendRequest", "send_requests"),
    ("loadModel", "load_model", "LoadModel"),
    ("writeOutput", "write_output", "WriteOutput"),
    ("computeHash", "compute_hash", "ComputeHash", "computehash"),
    ("mergeResults", "merge_results", "MergeResults"),
    ("validateInput", "validate_input", "ValidateInput"),
    ("cleanupTemp", "cleanup_temp", "CleanupTemp"),
    ("retryPolicy", "retry_policy", "RetryPolicy"),
    ("scanTable", "scan_table", "ScanTable"),
]
# Disjoint singletons that must NOT merge with anything.
DISJOINT_SYMBOLS = [
    "quantize", "reticulate", "extrapolate", "triangulate",
    "serialize_v2", "deflate", "bisect_left2", "normalize3",
]
HEAD_SYMBOLS = ["main", "utils", "init"]


def _commit_for(repo: str) -> str:
    return hashlib.sha1(repo.encode()).hexdigest()


def _py_def(rng: random.Random, name: str, callees: list[str]) -> list[str]:
    body_words = rng.choices(FILLER_WORDS + CONCEPT_WORDS, k=rng.randint(3, 8))
    lines = [f"def {name}(arg):", f"    # {' '.join(body_words)}"]
    for callee in callees:
        var = rng.choice(FILLER_WORDS)
        lines.append(f"    {var} = {callee}(arg)")
    lines.append(f"    return arg")
    lines.append("")
    return lines


def _gen_python_file(rng: random.Random, repo_idx: int, file_idx: int) -> str:
    lines: list[str] = []
    for mod in rng.sample(MODULES, k=rng.randint(1, 4)):
        if rng.random() < 0.3 and "." in mod:
            pkg, _, sub = mod.rpartition(".")
            lines.append(f"from {pkg} import {sub}")
        else:
            lines.append(f"import {mod}")
    lines.append("")
    # concept paragraph (comment block) at controlled density
    n_concept = rng.randint(0, 6)
    if n_concept:
        words = rng.choices(CONCEPT_WORDS, k=n_concept) + rng.choices(
            FILLER_WORDS, k=rng.randint(5, 20)
        )
        rng.shuffle(words)
        lines.append(f"# {' '.join(words)}")
        lines.append("")

    defined: list[str] = []
    # alias-cluster symbol (cross-repo linking ground truth)
    if rng.random() < 0.7:
        cluster = ALIAS_CLUSTERS[(repo_idx + file_idx) % len(ALIAS_CLUSTERS)]
        defined.append(cluster[repo_idx % len(cluster)])
    # disjoint symbol occasionally
    if rng.random() < 0.25:
        defined.append(rng.choice(DISJOINT_SYMBOLS))
    # head-symbol skew: main/utils/init in most files of most repos
    if rng.random() < 0.8:
        defined.append(rng.choice(HEAD_SYMBOLS))
    # plain local symbols
    for _ in range(rng.randint(1, 3)):
        defined.append(f"helper_{repo_idx}_{file_idx}_{rng.randint(0, 99)}")

    all_known = [c[0] for c in ALIAS_CLUSTERS] + HEAD_SYMBOLS + FILLER_WORDS
    for name in defined:
        callees = rng.sample(all_known, k=rng.randint(0, 3))
        lines.extend(_py_def(rng, name, callees))
    return "\n".join(lines)


def _gen_js_file(rng: random.Random, repo_idx: int, file_idx: int) -> str:
    lines = []
    for mod in rng.sample(["react", "lodash", "./util", "fs", "path"], k=rng.randint(1, 3)):
        if rng.random() < 0.5:
            lines.append(f"import x{rng.randint(0,9)} from '{mod}';")
        else:
            lines.append(f"const m{rng.randint(0,9)} = require('{mod}');")
    cluster = ALIAS_CLUSTERS[(repo_idx + file_idx) % len(ALIAS_CLUSTERS)]
    name = cluster[repo_idx % len(cluster)]
    lines.append(f"function {name}(arg) {{")
    lines.append(f"  // {' '.join(rng.choices(CONCEPT_WORDS + FILLER_WORDS, k=8))}")
    lines.append("  return arg;")
    lines.append("}")
    lines.append(f"const helper_{repo_idx}_{file_idx} = (x) => x + 1;")
    return "\n".join(lines)


def _gen_go_file(rng: random.Random, repo_idx: int, file_idx: int) -> str:
    lines = ["package main", ""]
    lines.append("import (")
    for mod in rng.sample(["fmt", "os", "strings", "net/http"], k=rng.randint(1, 3)):
        lines.append(f'    "{mod}"')
    lines.append(")")
    cluster = ALIAS_CLUSTERS[(repo_idx + file_idx) % len(ALIAS_CLUSTERS)]
    name = cluster[repo_idx % len(cluster)]
    lines.append(f"func {name}(arg int) int {{")
    lines.append("    return arg")
    lines.append("}")
    if rng.random() < 0.5:
        lines.append("func main() {")
        lines.append(f"    // {' '.join(rng.choices(CONCEPT_WORDS, k=4))}")
        lines.append("}")
    return "\n".join(lines)


def _n_repos_for(n_files: int) -> int:
    return max(4, int((n_files / 10) ** 0.5 * 2.2))


def _gen_row(rng: random.Random, i: int, n_repos: int) -> dict:
    """One corpus row from an rng positioned at this file's draw point.

    Shared by the sequential and the distributed generator; the rng call
    ORDER here is frozen (sequential determinism depends on it).
    """
    repo_idx = i % n_repos
    repo = f"org{repo_idx % 7}/repo{repo_idx}"
    file_idx = i // n_repos
    r = rng.random()
    if r < 0.70:
        lang, ext, gen = "python", "py", _gen_python_file
    elif r < 0.90:
        lang, ext, gen = "js", "js", _gen_js_file
    else:
        lang, ext, gen = "go", "go", _gen_go_file
    depth = rng.randint(1, 4)
    parts = [rng.choice(["src", "lib", "pkg", "internal", "app"])]
    parts += [f"mod{rng.randint(0, 9)}" for _ in range(depth - 1)]
    path = "/".join(parts) + f"/file_{file_idx}.{ext}"
    return {
        "repo": repo,
        "path": path,
        "commit": _commit_for(repo),
        "lang": lang,
        "content": gen(rng, repo_idx, file_idx),
    }


def generate_corpus(n_files: int = 500, seed: int = 42) -> list[dict]:
    """Generate ``n_files`` rows (plus a handful of fixed edge-case rows).

    Deterministic for a given (n_files, seed). ~50 repos at n_files=500,
    scaling as sqrt so bigger corpora get both more repos and more files/repo.
    """
    rng = random.Random(seed)
    n_repos = _n_repos_for(n_files)
    rows: list[dict] = []
    for i in range(n_files):
        rows.append(_gen_row(rng, i, n_repos))

    # --- fixed edge cases (FIXTURES.md §1) ---
    edge_repo = "org0/repo0"
    commit = _commit_for(edge_repo)
    rows.append({"repo": edge_repo, "path": "edge/empty.py", "commit": commit,
                 "lang": "python", "content": ""})
    rows.append({"repo": edge_repo, "path": "edge/blank.py", "commit": commit,
                 "lang": "python", "content": "   \n\t\n  \n"})
    big = "\n".join(
        f"# filler line {i} " + " ".join(rng.choices(FILLER_WORDS, k=12))
        for i in range(40000)
    )
    rows.append({"repo": edge_repo, "path": "edge/huge.py", "commit": commit,
                 "lang": "python", "content": "import os\n\ndef main(arg):\n    return arg\n\n" + big})
    rows.append({"repo": edge_repo, "path": "edge/weird.py", "commit": commit,
                 "lang": "python", "content": "# ÿþ� bytes \x01\x02\ndef init(arg):\n    return arg\n"})
    # byte-identical content in two different repos (dedup semantics)
    dup = "import json\n\ndef compute_hash(arg):\n    x = json(arg)\n    return arg\n"
    rows.append({"repo": "org1/repo1", "path": "dup/same.py", "commit": _commit_for("org1/repo1"),
                 "lang": "python", "content": dup})
    rows.append({"repo": "org2/repo2", "path": "dup/same.py", "commit": _commit_for("org2/repo2"),
                 "lang": "python", "content": dup})
    # same (repo,path) across two commits, content changed (change detection)
    rows.append({"repo": edge_repo, "path": "edge/versioned.py", "commit": "a" * 40,
                 "lang": "python", "content": "def fetch_data(arg):\n    return arg\n"})
    rows.append({"repo": edge_repo, "path": "edge/versioned.py", "commit": "b" * 40,
                 "lang": "python", "content": "def fetch_data(arg):\n    y = main(arg)\n    return y\n"})
    return rows


def generate_corpus_df(spark, n_files: int, seed: int = 42, partitions: int | None = None):
    """Distributed corpus generator: executors synthesize rows in parallel.

    Per-file determinism comes from seeding an rng per index
    (``Random(seed<<32 ^ i)``), so the output is stable under any
    partitioning — but it is a DIFFERENT (equally valid) corpus from the
    sequential ``generate_corpus``, whose single rng threads state across
    files. Tests/golden oracles use the sequential one; scaling/bench runs
    use this one, because a 10^12-file corpus can't be built on a driver.

    No edge-case rows here (the extractor's robustness to them is gated in
    pytest on the sequential corpus).
    """
    import pandas as pd

    from raptor_spark.schemas import FILES_SCHEMA

    n_repos = _n_repos_for(n_files)
    parts = partitions or max(32, spark.sparkContext.defaultParallelism * 2)

    def gen(batches):
        for pdf in batches:
            rows = [
                _gen_row(random.Random((seed << 32) ^ int(i)), int(i), n_repos)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in FILES_SCHEMA.fields])

    return spark.range(0, n_files, numPartitions=parts).mapInPandas(
        gen, schema=FILES_SCHEMA
    )
