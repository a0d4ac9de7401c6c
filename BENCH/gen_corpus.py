"""Generate the fixed synthetic corpus used by the scaling runs.

Writes generate_corpus(N) to parquet once so every scaling run reads byte-
identical input. Deterministic (seeded) per raptor_spark.synth.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=20000)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from raptor_spark.synth import generate_corpus_df

    df = generate_corpus_df(spark, args.files, partitions=128)
    df.write.mode("overwrite").parquet(args.output)
    print(f"wrote {args.files} files to {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
