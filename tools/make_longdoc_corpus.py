"""Generate a LONG-document corpus for the cold-cache exact-probe A/B
(r10 VERDICT task 3).

The sf* synthetic documents average ~120 compressed bytes/doc, which
caps the exact-dedup probe's byte advantage at ~3.3x (index is
~36 B/doc) and makes both cold reads I/O-trivial — the honest negative
result recorded in SCALE.md. The probe's 100 TB story is about corpora
where TEXT dominates (real web documents are ~KB compressed); this
generator builds that shape locally: ``n_docs`` documents of
``words_per_doc`` 8-hex-char words derived from per-(doc, position)
md5 — high-entropy, so parquet compression cannot collapse them — at
~1.2-1.8 KB/doc on disk. 3M docs ≈ 3-4 GB: small enough to generate in
a minute on 32 cores, large enough that a cold scan is seconds of real
disk I/O.

Text is deterministic in doc_id, so reruns are stable; content is
unique per doc (no duplicates — the A/B measures scan cost, not match
volume, and the sf A/Bs already cover matching).

Usage: python tools/make_longdoc_corpus.py [out_dir] [n_docs] [words_per_doc]
Defaults: /tmp/longdocs 3000000 200
Writes <out_dir>/documents.parquet (doc_id, text, lang, source, n_chars)
— the same schema the A/B tools read.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/longdocs"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
    words = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    from pyspark.sql import functions as F

    from ethereum_analytical_db_spark.session import get_spark

    spark = get_spark(
        app_name="make_longdoc_corpus",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(words)),
                    lambda i: F.substring(
                        F.md5(F.concat(F.col("id").cast("string"), F.lit(":"), i.cast("string"))),
                        1,
                        8,
                    ),
                ),
                " ",
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("longdoc").alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    path = os.path.join(out, "documents.parquet")
    df.write.mode("overwrite").parquet(path)
    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _d, files in os.walk(path)
        for f in files
    )
    print(f"{path}: {n_docs} docs, {size / 1e9:.2f} GB on disk")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
