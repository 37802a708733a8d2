"""Build a training corpus end-to-end: clean → pack → ship.

The LLM-data pack's full path as one runnable script over the synthetic
``documents`` table:

    python examples/build_training_corpus.py /root/testdata/sf0.01 /tmp/corpus_out
    python examples/build_training_corpus.py /root/testdata/sf0.1 /tmp/corpus_out \
        --seq-len 1024 --shard-rows 5000 --substring-k 8 --gzip

Stages (each an already-scale-audited operator — see SCALE.md):
1. ``clean_corpus``: exact dedup → [SemDeDup semantic dedup over the
   embeddings table, ``--semantic-threshold``] → exact-substring span
   dedup → line dedup → quality filter → language ID → PII scrub →
   split, with per-stage survival counts printed as the audit trail.
   ``--bpe-merges N`` additionally trains a BPE tokenizer on the
   cleaned corpus (operators/tokenizer.py) and ships the merge table
   next to the shards.
2. ``pack_sequences``: best-fit-decreasing sample packing to the token
   budget, per-split; fill-ratio summary printed. ``--chunk-overlap N``
   first splits over-window documents into overlapping chunks
   (``chunk_documents``), so nothing is truncated.
3. ``export_jsonl``: each split shipped as row-budgeted JSONL shards
   (train shards ordered by packed sequence so one shard holds whole
   sequences contiguously); ``--epoch-salt e1`` instead ships the
   deterministic epoch shuffle — sequences in salted-md5 order, each
   sequence's rows kept whole and in ``seq_pos`` order.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("sf_dir", help="directory with documents.parquet")
    p.add_argument("out_dir", help="output directory for JSONL shards")
    p.add_argument("--seq-len", type=int, default=512)
    p.add_argument("--shard-rows", type=int, default=10_000)
    p.add_argument("--substring-k", type=int, default=8)
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument(
        "--chunk-overlap",
        type=int,
        default=None,
        help="chunk documents longer than --seq-len into overlapping "
        "windows (this many shared tokens) before packing — otherwise "
        "the packer truncates them",
    )
    p.add_argument("--gzip", action="store_true")
    p.add_argument(
        "--semantic-threshold",
        type=float,
        default=None,
        help="SemDeDup semantic dedup over <sf_dir>/embeddings.parquet "
        "(vec_id = doc_id): drop docs whose embedding near-duplicates a "
        "kept one; docs without an embedding row pass through",
    )
    p.add_argument(
        "--bpe-merges",
        type=int,
        default=None,
        help="train a BPE tokenizer (this many merges) on the CLEANED "
        "corpus, write the merge table to <out_dir>/bpe_merges.parquet, "
        "and report the encoded token count",
    )
    p.add_argument(
        "--epoch-salt",
        default=None,
        help="ship a deterministic epoch shuffle (sequences in "
        "md5(seq_id||salt) order) instead of contiguous seq_id ranges",
    )
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = p.parse_args(argv)
    if args.chunk_overlap is not None and not 0 <= args.chunk_overlap < args.seq_len:
        # validate BEFORE the (expensive) cleaning pipeline runs — the
        # operator would raise the same constraint minutes later
        p.error(f"--chunk-overlap must satisfy 0 <= overlap < --seq-len ({args.seq_len})")

    from pyspark.sql import functions as F

    from ethereum_analytical_db_spark.operators.corpus import clean_corpus
    from ethereum_analytical_db_spark.operators.packing import (
        chunk_documents,
        pack_sequences,
        packing_stats,
    )
    from ethereum_analytical_db_spark.session import get_spark
    from ethereum_analytical_db_spark.sources.files import export_jsonl

    spark = get_spark(app_name="build_training_corpus", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    clean_kw = {}
    if args.semantic_threshold is not None:
        clean_kw["embeddings"] = spark.read.parquet(
            os.path.join(args.sf_dir, "embeddings.parquet")
        )
        clean_kw["semantic_threshold"] = args.semantic_threshold
    report = clean_corpus(
        docs,
        substring_dedup_k=args.substring_k,
        min_tokens=args.min_tokens,
        **clean_kw,
    )
    print("cleaning audit trail:")
    for name, rows in report.stages:
        print(f"  {name:>18}: {rows} rows")

    if args.bpe_merges is not None:
        from ethereum_analytical_db_spark.operators.tokenizer import (
            encode_bpe,
            merge_table,
            train_bpe,
        )

        merges = train_bpe(report.df, num_merges=args.bpe_merges)
        merge_table(spark, merges).write.mode("overwrite").parquet(
            os.path.join(args.out_dir, "bpe_merges.parquet")
        )
        n_tok = (
            encode_bpe(report.df, merges)
            .agg(F.sum("n_tokens").alias("t"))
            .first()["t"]
        )
        head = ", ".join(f"{l}+{r}" for l, r, _ in merges[:5])
        print(
            f"bpe: {len(merges)} merges trained on the cleaned corpus "
            f"(head: {head}); {n_tok} encoded tokens"
        )

    try:
        total_shards = 0
        for split in ("train", "valid", "test"):
            part = report.df.filter(F.col("split") == split)
            ship_cols = ["doc_id", "seq_id", "seq_pos", "lang", "text"]
            pack_id = "doc_id"
            if args.chunk_overlap is not None:
                # long docs become window chunks; the packer then never
                # truncates. doc_id stays UNCHANGED (shipped rows carry
                # chunk_idx alongside, so consumers can still join the
                # shards back to documents.parquet — review find); the
                # packer gets a synthetic per-chunk id instead
                part = (
                    chunk_documents(
                        part,
                        max_tokens=args.seq_len,
                        overlap=args.chunk_overlap,
                        passthrough=["lang"],
                    )
                    .withColumn(
                        "_cid",
                        F.concat_ws("-", F.col("doc_id"), F.col("chunk_idx")),
                    )
                    .withColumnRenamed("chunk_text", "text")
                    .drop("chunk_tokens")
                )
                ship_cols = ["doc_id", "chunk_idx", "seq_id", "seq_pos", "lang", "text"]
                pack_id = "_cid"
            # cache: the stats pass and the export join both materialize
            # the packing — uncached, the count + shuffle + best-fit
            # applyInPandas would run twice per split
            packed = pack_sequences(part, seq_len=args.seq_len, id_col=pack_id).cache()
            stats = packing_stats(packed, args.seq_len).first()
            print(
                f"{split}: {stats['sequences']} sequences, "
                f"fill {float(stats['fill_ratio'] or 0):.1%}, "
                f"{stats['truncated_sequences']} truncated"
            )
            shipped = part.join(
                # pack_sequences names its id column doc_id whatever the
                # input id_col was — alias it back to the join key
                packed.select(
                    F.col("doc_id").alias(pack_id), "seq_id", "seq_pos"
                ),
                pack_id,
            ).select(*ship_cols)
            if args.epoch_salt is not None:
                ship_kw = dict(shuffle_by="seq_id", shuffle_salt=args.epoch_salt)
            else:
                ship_kw = dict(order_by="seq_id")
            # either way the rows of a sequence must ship in reading
            # order — tie order under the primary sort alone is
            # undefined (review find)
            ship_kw["within_order"] = "seq_pos"
            n = export_jsonl(
                shipped,
                os.path.join(args.out_dir, split),
                shard_max_rows=args.shard_rows,
                compress=args.gzip,
                **ship_kw,
            )
            total_shards += n
            packed.unpersist()
            print(f"{split}: {n} shard file(s)")
        print(f"done: {total_shards} shards under {args.out_dir}")
    finally:
        report.release()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
