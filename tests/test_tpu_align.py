"""Batched device aligner vs oracle aligner: exact equality."""

import random

from lancet_tpu.engine.align import global_align_aff
from lancet_tpu.tpu.align_batch import batch_align


def _random_pairs(rng, n_pairs, edits=True):
    pairs = []
    for _ in range(n_pairs):
        n = rng.randint(30, 250)
        S = "".join(rng.choice("ACGT") for _ in range(n))
        if edits:
            T = list(S)
            for _ in range(rng.randint(1, 5)):
                op = rng.choice("sid")
                p = rng.randint(5, len(T) - 5)
                if op == "s":
                    T[p] = rng.choice("ACGT")
                elif op == "i":
                    T.insert(p, rng.choice("ACGT"))
                else:
                    del T[p]
            T = "".join(T)
        else:
            T = "".join(rng.choice("ACGT") for _ in range(rng.randint(30, 250)))
        pairs.append((S, T))
    return pairs


def test_batch_matches_oracle_edit_pairs():
    rng = random.Random(7)
    pairs = _random_pairs(rng, 24, edits=True)
    got = batch_align(pairs)
    for (S, T), (sa, ta) in zip(pairs, got):
        esa, eta = global_align_aff(S, T)
        assert (sa, ta) == (esa, eta), (S, T)


def test_batch_matches_oracle_divergent_pairs():
    rng = random.Random(8)
    pairs = _random_pairs(rng, 12, edits=False)
    got = batch_align(pairs)
    for (S, T), (sa, ta) in zip(pairs, got):
        esa, eta = global_align_aff(S, T)
        assert (sa, ta) == (esa, eta), (S, T)


def test_batch_mixed_lengths():
    pairs = [("ACGT", "ACGT"), ("A" * 200, "A" * 190 + "C" * 10),
             ("ACGTACGTAC", "ACG")]
    got = batch_align(pairs)
    for (S, T), (sa, ta) in zip(pairs, got):
        assert (sa, ta) == global_align_aff(S, T)
