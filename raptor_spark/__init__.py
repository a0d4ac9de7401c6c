"""raptor_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the *computational capabilities* of the
reference content-insight engine (Robertdht/RAPTOR, surveyed in SURVEY.md) as a
batch KG-construction pipeline over a table of source-code repositories
``(repo, path, commit, lang, content)``:

* stage 1 ``extract``   — vectorized pandas-UDF tokenization emitting
  ``(subj, pred, obj)`` triples (imports / defs / calls / concept tags),
  the Spark-first analog of the reference's per-filetype processors
  (``svc/document_analysis_service/processors/*.py``).
* stage 2 ``link``      — MinHash/LSH blocking + salted candidate-pair join +
  Jaccard verify, the analog of the reference's ANN insert-dedup
  (``raptor/qdrant_search_docker/api_insert.py:130-165``).
* stage 3 ``cc``        — iterative connected-components label propagation
  (pure DataFrame joins, no GraphFrames) for symbol canonicalization.
* stage 4 ``materialize`` — partitioned nodes/edges tables + per-partition
  lineage rows enabling checkpoint-restart (the analog of the reference's
  Redis step state machine + MySQL commit_history).

Everything is DataFrame-first; content is touched only inside Arrow-batched
pandas UDFs. No RDD API, no per-row Python UDFs.
"""

__version__ = "0.1.0"
