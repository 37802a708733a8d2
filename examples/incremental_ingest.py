"""Incremental corpus ingest: dedup each arriving shard without ever
re-hashing the corpus.

Two equivalent drivers over the same loop (pick with ``--mode``):

- ``batch``  — explicit probe → append per shard
  (``operators/dedup.minhash_probe_candidates`` / ``minhash_index_append``):

      python examples/incremental_ingest.py /root/testdata/sf0.01 /tmp/ingest_out

- ``stream`` — the Structured Streaming twin
  (``streaming/dedupe_stream.near_dedup_stream``): shards dropped as
  files become micro-batches; the probe→append loop runs in
  ``foreachBatch`` with replay-deterministic batch-partitioned writes:

      python examples/incremental_ingest.py /root/testdata/sf0.01 /tmp/ingest_out --mode stream

``--family simhash`` switches both modes from the MinHash band index
(Jaccard-ish candidates) to the SimHash chunk index (Hamming
near-dups); ``--family exact`` to the md5 digest index (identical
content, (canonical, duplicate) pairs) — same loop, same cost model.

Both modes print, per shard, the near-dup candidate pairs found against
everything ingested before it — each pair reported exactly once, by the
shard of its later document (parity with the one-shot batch operator is
pinned in tests/test_dedup.py and tests/test_dedupe_stream.py). At
100 TB the point is the cost model: per-shard work is O(shard hashing +
corpus scan + matches); the corpus's own shingle→minhash pipeline ran
once, at index build, and never again.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("sf_dir", help="directory with documents.parquet")
    p.add_argument("out_dir", help="working directory (index + pairs land here)")
    p.add_argument("--mode", choices=("batch", "stream"), default="batch")
    p.add_argument(
        "--family",
        choices=("minhash", "simhash", "exact"),
        default="minhash",
        help="signature scheme: LSH bands (Jaccard-ish), SimHash chunks "
        "(Hamming), or exact md5 digests (identical content)",
    )
    p.add_argument("--shards", type=int, default=4)
    p.add_argument(
        "--max-bucket-df",
        type=int,
        default=None,
        help="hot-bucket cap (minhash: band buckets, simhash: chunks) — "
        "the boilerplate-corpus guard; probes compute it over index+shard",
    )
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    p.add_argument(
        "--compact-every",
        type=int,
        default=None,
        help="stream mode: fold the index every N micro-batches "
        "(near_dedup_stream's bounded-file-count knob); batch mode "
        "always compacts once at the end",
    )
    p.add_argument(
        "--force",
        action="store_true",
        help="wipe a non-empty out_dir instead of refusing to run",
    )
    args = p.parse_args(argv)

    # out_dir is DESTROYED and rebuilt each run; refuse a non-empty
    # target unless --force, so a typo'd path (or a previous run worth
    # keeping) is never silently deleted (review find)
    if os.path.isdir(args.out_dir) and os.listdir(args.out_dir) and not args.force:
        p.error(
            f"out_dir {args.out_dir!r} exists and is not empty; pass "
            "--force to wipe it"
        )

    from pyspark.sql import functions as F

    from ethereum_analytical_db_spark.session import get_spark

    spark = get_spark(app_name="incremental_ingest", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    shutil.rmtree(args.out_dir, ignore_errors=True)
    os.makedirs(args.out_dir)
    index_path = os.path.join(args.out_dir, "band_index")
    pairs_path = os.path.join(args.out_dir, "pairs")
    shard_of = F.col("doc_id") % args.shards

    if args.mode == "batch":
        from ethereum_analytical_db_spark.operators import dedup

        if args.family == "minhash":
            write, append = dedup.minhash_index_write, dedup.minhash_index_append
            probe = lambda shard: dedup.minhash_probe_candidates(  # noqa: E731
                spark, index_path, shard, max_bucket_df=args.max_bucket_df
            )
            score_col = "bands_in_common"
        elif args.family == "exact":
            write, append = dedup.exact_index_write, dedup.exact_index_append
            probe = lambda shard: dedup.exact_probe_duplicates(  # noqa: E731
                spark, index_path, shard
            )
            score_col = "digest"
        else:
            write, append = dedup.simhash_index_write, dedup.simhash_index_append
            probe = lambda shard: dedup.simhash_probe_candidates(  # noqa: E731
                spark, index_path, shard, max_chunk_df=args.max_bucket_df
            )
            score_col = "hamming"

        # shard 0 seeds the index; later shards probe then join the corpus
        write(docs.filter(shard_of == 0), index_path)
        print(f"shard 0: indexed {docs.filter(shard_of == 0).count()} docs (seed)")
        for s in range(1, args.shards):
            shard = docs.filter(shard_of == s)
            hits = probe(shard).orderBy("doc_a", "doc_b").collect()
            print(f"shard {s}: {shard.count()} docs, {len(hits)} near-dup candidates")
            for r in hits[:5]:
                print(f"    ({r['doc_a']}, {r['doc_b']}) {score_col}={r[score_col]}")
            append(shard, index_path)
    else:
        from ethereum_analytical_db_spark.streaming import dedupe_stream as ds
        from ethereum_analytical_db_spark.streaming import stream as st

        src = os.path.join(args.out_dir, "arrivals")
        os.makedirs(src)
        for s in range(args.shards):  # one file per shard → one micro-batch each
            docs.filter(shard_of == s).coalesce(1).write.mode("append").parquet(src)
        q = (
            ds.near_dedup_stream(
                st.stream_from_files(spark, src, docs.schema, max_files_per_trigger=1),
                index_path,
                pairs_path,
                family=args.family,
                max_bucket_df=args.max_bucket_df if args.family == "minhash" else None,
                max_chunk_df=args.max_bucket_df if args.family == "simhash" else None,
                compact_every=args.compact_every,
            )
            .option("checkpointLocation", os.path.join(args.out_dir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        st.run_available_now(q)
        import glob as _glob

        # a pair-free corpus leaves pairs_path with no data partitions
        # (dynamic overwrite writes nothing for empty batches), which a
        # schemaless read cannot even open
        if _glob.glob(os.path.join(pairs_path, "gen=*")):
            pairs = spark.read.parquet(pairs_path)
            for row in pairs.groupBy("batch").count().orderBy("batch").collect():
                print(f"batch {row['batch']}: {row['count']} near-dup candidates")
            pairs.orderBy("doc_a", "doc_b").show(5)
        else:
            print("no near-dup candidates found in any batch")

    n_idx = spark.read.parquet(index_path).count()
    print(f"index now holds {n_idx} band rows — next shard probes it as corpus")

    if args.mode == "batch":
        # the appends left one small file per shard per partition dir;
        # compact to one file per dir (crash-safe swap, sidecar kept)
        import glob

        from ethereum_analytical_db_spark.operators.dedup import compact_index

        pat = os.path.join(index_path, "*=*", "*.parquet")
        before = len(glob.glob(pat))
        part_col = {"minhash": "band", "simhash": "blk", "exact": "pfx"}[args.family]
        compact_index(spark, index_path, [part_col])
        print(
            f"compacted: {before} -> {len(glob.glob(pat))} files, "
            f"{spark.read.parquet(index_path).count()} rows unchanged"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
