"""Pallas Gotoh fill (interpret mode on the CPU mesh) vs the lax.scan
fill, and end-to-end batch_align parity with the oracle aligner."""

import numpy as np
import pytest

from lancet_tpu.engine.align import global_align_aff
from lancet_tpu.tpu import align_batch
from lancet_tpu.tpu.pallas_gotoh import PB, make_tr2, pallas_dp_fill


def _random_pairs(rng, n_pairs, max_len):
    pairs = []
    for _ in range(n_pairs):
        n = rng.integers(5, max_len)
        m = rng.integers(5, max_len)
        s = "".join(rng.choice(list("ACGT"), n))
        t = "".join(rng.choice(list("ACGT"), m))
        # bias towards related sequences (realistic paths vs ref)
        if rng.random() < 0.6:
            t = list(s)
            for _ in range(rng.integers(1, 6)):
                op = rng.integers(0, 3)
                p = int(rng.integers(0, len(t)))
                if op == 0:
                    t[p] = rng.choice(list("ACGT"))
                elif op == 1 and len(t) > 6:
                    del t[p]
                else:
                    t.insert(p, rng.choice(list("ACGT")))
            t = "".join(t)
        pairs.append((s, t))
    return pairs


def _pack(pairs, N, M):
    import jax.numpy as jnp

    P = len(pairs)
    S = np.zeros((P, N + 1), np.uint8)
    T = np.zeros((P, M + 1), np.uint8)
    for p, (s, t) in enumerate(pairs):
        S[p, 1 : len(s) + 1] = np.frombuffer(s.encode(), np.uint8)
        T[p, 1 : len(t) + 1] = np.frombuffer(t.encode(), np.uint8)
    return jnp.asarray(S), jnp.asarray(T)


def test_fill_matches_scan_fill():
    rng = np.random.default_rng(0)
    N = M = 64
    pairs = _random_pairs(rng, PB, 60)
    S, T = _pack(pairs, N, M)
    n_len = np.array([len(s) for s, _ in pairs], np.int32)
    m_len = np.array([len(t) for _, t in pairs], np.int32)
    want = np.asarray(align_batch._dp_fill(S, T, n_len, m_len, N, M))
    got = np.asarray(pallas_dp_fill(S, make_tr2(T, N, M), N, M,
                                    interpret=True))
    assert got.shape[0] == want.shape[0] and got.shape[2] >= want.shape[2]
    # compare only lanes that are real DP cells (i <= min(d, n), j <= m):
    # out-of-range lanes are don't-cares (traceback never reads them)
    D = want.shape[0]
    for d in range(D):
        dd = d + 2
        for p in range(PB):
            lo = max(0, dd - m_len[p])
            hi = min(dd, int(n_len[p]))
            w = want[d, p, lo : hi + 1]
            g = got[d, p, lo : hi + 1]
            assert np.array_equal(w, g), (d, p, w, g)


def test_batch_align_pallas_interpret_equals_oracle(monkeypatch):
    monkeypatch.setenv("LANCET_TPU_PALLAS", "1")
    monkeypatch.setattr(
        "lancet_tpu.tpu.pallas_gotoh.pallas_dp_fill",
        lambda S, TR2, N, M: pallas_dp_fill(S, TR2, N, M, interpret=True))
    rng = np.random.default_rng(7)
    pairs = _random_pairs(rng, 16, 120)
    got = align_batch.batch_align(pairs)
    for (s, t), (ga, gb) in zip(pairs, got):
        wa, wb = global_align_aff(s, t)
        assert (ga, gb) == (wa, wb), (s, t)
