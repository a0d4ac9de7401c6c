"""Reusable relational/content operators re-expressed Spark-first from the
reference's hand-rolled dataflow stages (SURVEY.md §2).

Each module cites the reference file:line whose semantics it generalizes.
"""
