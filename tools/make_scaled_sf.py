"""Synthesize a scaled testdata directory from sf0.1 by replicating each
table K times with disjoint key spaces — the empirical scale-up check
behind SCALE.md (VERDICT r3 item 7).

Design goals (so sf0.1→sfK ratios measure the ENGINE, not an artifact):
- fact keys are offset per replica so join fan-outs stay 1:1 (orderkey /
  custkey / partkey / suppkey move together; fixed dims region/nation
  keep their TPC-H cardinality);
- document text gets a per-replica suffix appended to EVERY word: every
  word and 3-gram shingle becomes replica-unique (the near-dup inverted
  index grows linearly) while the token-count DISTRIBUTION is exactly
  preserved. The first cut interleaved one replica token between words
  instead — that token then made up half of every doc's token mass,
  biasing every SimHash bit the same way within a replica, collapsing
  all signatures together and blowing the chunk self-join up
  quadratically (observed: simhash_near_duplicates 2.3 s → >240 s at
  10×). Per-word suffixing just remaps each word's hash, so within-
  replica similarity structure matches the source corpus;
- embeddings get a deterministic per-replica sign-flip pattern: within a
  replica all pairwise cosines are EXACTLY preserved (cos(a*s, b*s) =
  cos(a, b) for s in {±1}^d), across replicas they decorrelate, so
  near-dup pair counts and ANN workload scale linearly;
- every table is written ORDER BY its offset primary key: the cross
  join otherwise interleaves replicas, putting rows from every key range
  into every parquet row group — min/max stats then prune nothing and a
  selective scan (e.g. the constant-size `event_id < 4000` fixture cap)
  degrades to a full decode. Sorted-by-key is the realistic layout (the
  engine's own writes partition by block range for the same reason).

Usage: python tools/make_scaled_sf.py [out_dir] [K] [src_dir] [--tables a,b]
Defaults: /tmp/sf1 10 /root/testdata/sf0.1, all tables.
``--tables documents`` emits only the named tables — the sf100 probe
corpus (r10 VERDICT task 4) needs 1000 replicas of `documents` alone,
and 1000x the full TPC-H fact set would be tens of GB of unused data.
K must key off sf0.1 (the offset strides assume its key ranges).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC_DEFAULT = "/root/testdata/sf0.1"

# per-table key-offset plan: (column, stride) pairs; stride must exceed
# the column's max in the source so replica key spaces are disjoint
OFFSETS = {
    "customer": [("c_custkey", 1_000_000)],
    "orders": [("o_orderkey", 10_000_000), ("o_custkey", 1_000_000)],
    "lineitem": [
        ("l_orderkey", 10_000_000),
        ("l_partkey", 1_000_000),
        ("l_suppkey", 100_000),
    ],
    "part": [("p_partkey", 1_000_000)],
    "supplier": [("s_suppkey", 100_000)],
    "events": [("event_id", 10_000_000), ("user_id", 1_000_000)],
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    only: set[str] | None = None
    argv = list(sys.argv[1:])
    for i, a in enumerate(argv):
        if a == "--tables":
            if i + 1 >= len(argv) or not argv[i + 1].strip():
                raise SystemExit("--tables needs a comma-separated list")
            only = {t.strip() for t in argv[i + 1].split(",") if t.strip()}
            known = set(OFFSETS) | set(COPY_AS_IS) | {"documents", "embeddings"}
            unknown = only - known
            if unknown:
                raise SystemExit(
                    f"--tables names unknown tables: {sorted(unknown)} "
                    f"(known: {sorted(known)})"
                )
            argv = argv[:i] + argv[i + 2:]
            break
    out = argv[0] if len(argv) > 0 else "/tmp/sf1"
    k = int(argv[1]) if len(argv) > 1 else 10
    src = argv[2] if len(argv) > 2 else SRC_DEFAULT
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({k})) AS r")

    def emit(table: str, select: str) -> None:
        if only is not None and table not in only:
            return
        path = f"{out}/{table}.parquet"
        con.execute(
            f"COPY ({select}) TO '{path}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{path}'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in COPY_AS_IS:
        emit(t, f"SELECT * FROM '{src}/{t}.parquet'")

    for t, offs in OFFSETS.items():
        cols = con.execute(
            f"SELECT * FROM '{src}/{t}.parquet' LIMIT 0"
        ).description
        names = [c[0] for c in cols]
        off_map = dict(offs)
        exprs = []
        for name in names:
            if name in off_map:
                exprs.append(f"{name} + r * {off_map[name]} AS {name}")
            else:
                exprs.append(name)
        key = offs[0][0]
        emit(
            t,
            f"SELECT {', '.join(exprs)} FROM '{src}/{t}.parquet', reps "
            f"ORDER BY {key}",
        )

    # documents: replica-unique words/shingles via a per-word suffix
    # (token-count distribution preserved — see module docstring)
    emit(
        "documents",
        f"""
        WITH scaled AS (
          SELECT doc_id + r * 10_000_000 AS doc_id,
                 CASE WHEN r = 0 THEN text ELSE
                   array_to_string(
                     list_transform(string_split(text, ' '),
                                    w -> w || 'q' || r),
                     ' ')
                 END AS text,
                 lang, source
          FROM '{src}/documents.parquet', reps
        )
        SELECT doc_id, text, lang, source,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM scaled ORDER BY doc_id
        """,
    )

    # embeddings: per-replica deterministic sign flips (r=0 unchanged)
    emit(
        "embeddings",
        f"""
        SELECT vec_id + r * 10_000_000 AS vec_id,
               CASE WHEN r = 0 THEN embedding ELSE
                 list_transform(
                   list_zip(embedding, range(1, len(embedding) + 1)),
                   p -> CAST(p[1] * (CASE WHEN hash(r * 1000 + p[2]) % 2 = 0
                                         THEN 1 ELSE -1 END) AS FLOAT)
                 )
               END AS embedding,
               label
        FROM '{src}/embeddings.parquet', reps
        ORDER BY vec_id
        """,
    )


if __name__ == "__main__":
    main()
