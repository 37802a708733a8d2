"""Smoke test for examples/build_training_corpus.py — the worked
example must actually run end-to-end with the r12 flags (SemDeDup
stage + BPE tokenizer training) against the driver fixture corpus."""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata not present")
def test_build_training_corpus_example(spark, tmp_path, capsys):
    sys.path.insert(0, os.path.join(ROOT, "examples"))
    import build_training_corpus as ex

    out = str(tmp_path / "corpus_out")
    rc = ex.main(
        [
            SF,
            out,
            "--seq-len",
            "256",
            "--min-tokens",
            "1",
            "--semantic-threshold",
            "0.999",
            "--bpe-merges",
            "8",
            "--cpus",
            "4",
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "semantic_dedup" in printed
    assert "bpe: 8 merges" in printed
    assert os.path.isdir(os.path.join(out, "bpe_merges.parquet"))
    mt = spark.read.parquet(os.path.join(out, "bpe_merges.parquet"))
    assert mt.count() == 8
    assert set(mt.columns) == {"rank", "left_sym", "right_sym", "pair_freq"}
    # shards exist for the train split
    assert any(
        f.startswith("part-") or f.endswith(".jsonl")
        for f in os.listdir(os.path.join(out, "train"))
    )
