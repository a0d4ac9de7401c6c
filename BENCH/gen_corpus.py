"""Generate the fixed synthetic corpus used by the scaling runs.

Writes generate_corpus(N) to parquet once so every scaling run reads byte-
identical input. Deterministic (seeded) per raptor_spark.synth.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


# Appended to a deterministic ~skew_frac share of files: a def block whose
# body calls 5 fixed head symbols, so those names' document frequency spikes
# across the corpus — the deliberate-skew stress for the link+cc path's
# head-symbol guards (exact-only linking for high-DF names, capped band
# buckets). The callees mix the synth corpus's own head symbols with two
# alias-cluster spellings so the skew hits BOTH guard families.
SKEW_PROBE = (
    "\n\ndef skew_probe(arg):\n"
    "    main(arg)\n"
    "    utils(arg)\n"
    "    init(arg)\n"
    "    parse_config(arg)\n"
    "    fetch_data(arg)\n"
    "    return arg\n"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=20000)
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--skew-frac",
        type=float,
        default=0.0,
        help="append the 5-head-symbol skew probe to this share of files "
        "(content-hash selected, deterministic; 0 disables)",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from raptor_spark.synth import generate_corpus_df

    df = generate_corpus_df(spark, args.files, partitions=128)
    if args.skew_frac > 0:
        from pyspark.sql import functions as F

        sel = F.pmod(F.xxhash64("repo", "path"), F.lit(1000)) < F.lit(
            int(args.skew_frac * 1000)
        )
        df = df.withColumn(
            "content",
            F.when(sel, F.concat(F.col("content"), F.lit(SKEW_PROBE)))
            .otherwise(F.col("content")),
        )
    df.write.mode("overwrite").parquet(args.output)
    print(f"wrote {args.files} files to {args.output}"
          + (f" (skew_frac={args.skew_frac})" if args.skew_frac else ""))
    spark.stop()


if __name__ == "__main__":
    main()
