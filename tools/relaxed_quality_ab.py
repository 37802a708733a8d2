"""Relaxed-BPE quality A/B (r14 VERDICT task 6): measure the
equal-merge-budget token cost of skip-and-continue batch selection —
and whether the interference-aware ``min_pick_ratio`` floor buys any of
it back — on a deterministic natural-ish Zipf corpus. Pure Python (the
selectors are driver-side functions; the loop is the same
pure-Python replica the exactness property tests hammer), so the
numbers are box-load-independent.

Metric: total encoded tokens over the training corpus = Σ freq ×
len(final symbol sequence) from the training loop's own end state
(encode == training replay for these selectors, pinned in
tests/test_tokenizer.py). Lower is better; the sequential exact
trainer at the same merge budget is the anchor.

Usage: python tools/relaxed_quality_ab.py [--merges 300,1000]
       [--ratios 0,0.25,0.5,0.75,1.0]
Prints one JSON line per (merge budget, variant).
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ethereum_analytical_db_spark.operators import tokenizer  # noqa: E402


def natural_corpus(
    n_vocab: int = 5000, seed: int = 99
) -> dict[tuple[str, ...], int]:
    """Zipf-weighted vocabulary over letter-frequency-ish words: word
    rank r gets weight ~ N/r. Returns the (symbols, freq) reduction
    directly (the trainer's input shape) — the corpus itself is never
    materialized."""
    rng = random.Random(seed)
    letters = "etaoinshrdlucmfwypvbgkjqxz"
    weights = [26 - i for i in range(26)]
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < n_vocab:
        w = "".join(
            rng.choices(letters, weights=weights, k=rng.randint(2, 12))
        )
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return {
        tuple(w): max(1, n_vocab // (i + 1)) for i, w in enumerate(vocab)
    }


def pair_counts(sym_freq: dict[tuple[str, ...], int]) -> Counter:
    pc: Counter = Counter()
    for syms, f in sym_freq.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += f
    return pc


def apply_one(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return tuple(out)


def train(
    sym_freq: dict[tuple[str, ...], int],
    num_merges: int,
    *,
    variant: str,
    batch: int = 64,
    min_freq: int = 2,
    ratio: float = 0.0,
) -> dict:
    """variant: 'exact' (sequential greedy, one merge per round — the
    quality anchor), 'exact_batched' (select_merge_batch), or 'relaxed'
    (select_merge_batch_relaxed at ``ratio``)."""
    state = dict(sym_freq)
    superset = {c for w in state for c in w}
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    while len(merges) < num_merges:
        fetch = min(batch, num_merges - len(merges))
        window = fetch * (8 if variant == "relaxed" else 2) + 1
        pc = pair_counts(state)
        allc = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        cands = [(l, r, f) for (l, r), f in allc[: window + 1]]
        if not cands or cands[0][2] < min_freq:
            break
        if variant == "exact":
            picks = [cands[0]] if cands[0][2] >= min_freq else []
        elif variant == "exact_batched":
            picks = tokenizer.select_merge_batch(
                cands, superset, min_freq, fetch,
                table_exhausted=len(allc) <= window,
            )
        else:
            picks = tokenizer.select_merge_batch_relaxed(
                cands, superset, min_freq, fetch, min_pick_ratio=ratio
            )
        if not picks:
            break
        rounds += 1
        merges.extend(picks)
        superset.update(l + r for l, r, _ in picks)
        new: Counter = Counter()
        for syms, f in state.items():
            for l, r, _ in picks:
                syms = apply_one(syms, l, r)
            new[syms] += f
        state = dict(new)
    tokens = sum(len(syms) * f for syms, f in state.items())
    return {"merges": len(merges), "rounds": rounds, "tokens": tokens}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--merges", default="300,1000")
    ap.add_argument("--ratios", default="0,0.25,0.5,0.75,1.0")
    ap.add_argument("--vocab", type=int, default=5000)
    args = ap.parse_args()
    sym_freq = natural_corpus(args.vocab)
    for budget in [int(x) for x in args.merges.split(",")]:
        anchor = train(sym_freq, budget, variant="exact")
        print(json.dumps({"budget": budget, "variant": "exact", **anchor}))
        eb = train(sym_freq, budget, variant="exact_batched")
        print(
            json.dumps(
                {
                    "budget": budget,
                    "variant": "exact_batched",
                    **eb,
                    "vs_exact": round(eb["tokens"] / anchor["tokens"], 4),
                }
            )
        )
        for ratio in [float(x) for x in args.ratios.split(",")]:
            r = train(sym_freq, budget, variant="relaxed", ratio=ratio)
            print(
                json.dumps(
                    {
                        "budget": budget,
                        "variant": f"relaxed@{ratio}",
                        **r,
                        "vs_exact": round(r["tokens"] / anchor["tokens"], 4),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
