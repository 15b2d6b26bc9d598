"""Sharded SPMD step: device-count invariance (the TPU analog of the
reference's thread-count-invariant output, SURVEY.md §2.3)."""

import numpy as np
import pytest

from lancet_tpu.parallel.mesh import (make_mesh, sharded_step,
                                      sharded_window_step)
from lancet_tpu.tpu.repeats import repeat_gates


def _mk(P, N, M, L, seed=3):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    S = np.zeros((P, N + 1), np.uint8)
    T = np.zeros((P, M + 1), np.uint8)
    seq = np.zeros((P, L), np.uint8)
    lens = np.zeros(P, np.int32)
    n_len = np.zeros(P, np.int32)
    m_len = np.zeros(P, np.int32)
    for p in range(P):
        n = int(rng.integers(20, N)); m = int(rng.integers(20, M))
        S[p, 1:n+1] = bases[rng.integers(0, 4, n)]
        T[p, 1:m+1] = bases[rng.integers(0, 4, m)]
        n_len[p], m_len[p] = n, m
        wl = int(rng.integers(30, L))
        seq[p, :wl] = bases[rng.integers(0, 4, wl)]
        lens[p] = wl
    return seq, lens, S, T, n_len, m_len


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_window_step_device_count_invariant(ndev):
    import jax

    if len(jax.devices()) < ndev:
        pytest.skip("virtual device mesh too small")
    P, N, M, L = 16, 64, 64, 72
    seq, lens, S, T, n_len, m_len = _mk(P, N, M, L)
    mesh = make_mesh(ndev)
    with mesh:
        gates, sc, recs, stats = sharded_window_step(
            mesh, seq, lens, S, T, n_len, m_len, (11, 13, 15), 2)
    gates = np.asarray(gates); sc = np.asarray(sc)
    recs = np.asarray(recs); stats = np.asarray(stats)
    # gates match the single-device kernel wrapper
    windows = ["".join(chr(c) for c in seq[p, :lens[p]]) for p in range(P)]
    want_gates = repeat_gates(windows, [11, 13, 15], 2)
    assert np.array_equal(gates, want_gates)
    # records carry (score, n, m) for every pair regardless of shard count
    assert np.array_equal(recs[:, 1], n_len)
    assert np.array_equal(recs[:, 2], m_len)
    assert np.array_equal(recs[:, 0], sc)
    # replicated stats agree with local reduction
    assert abs(stats[0] - sc.mean()) < 1e-4
    key = (tuple(sc), tuple(gates.ravel()))
    # stash for cross-ndev comparison
    test_window_step_device_count_invariant.results.setdefault(
        "key", key)
    assert test_window_step_device_count_invariant.results["key"] == key


test_window_step_device_count_invariant.results = {}


def _dp_score(s, t):
    """M[n][m] under the exact reference recurrence (align.cc:235-281):
    open = M + GAP_OPEN, extend = gap + GAP_EXTEND, boundary
    M[0][d] = M[d][0] = GAP_OPEN + d*GAP_EXTEND."""
    import numpy as np

    from lancet_tpu.engine.align import (GAP_EXTEND, GAP_OPEN, MATCH,
                                         MISMATCH)

    n, m = len(s), len(t)
    NEG = -10**9
    Mm = np.full((n + 1, m + 1), NEG, np.int64)
    X = np.full((n + 1, m + 1), NEG, np.int64)
    Y = np.full((n + 1, m + 1), NEG, np.int64)
    Mm[0][0] = 0
    for i in range(1, n + 1):
        b = GAP_OPEN + i * GAP_EXTEND
        Mm[i][0] = b; X[i][0] = b
    for j in range(1, m + 1):
        b = GAP_OPEN + j * GAP_EXTEND
        Mm[0][j] = b; Y[0][j] = b
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            X[i][j] = max(X[i - 1][j] + GAP_EXTEND, Mm[i - 1][j] + GAP_OPEN)
            Y[i][j] = max(Y[i][j - 1] + GAP_EXTEND, Mm[i][j - 1] + GAP_OPEN)
            sub = MATCH if s[i - 1] == t[j - 1] else MISMATCH
            Mm[i][j] = max(Mm[i - 1][j - 1] + sub, X[i][j], Y[i][j])
    return int(Mm[n][m])


def test_sharded_step_matches_oracle_scores():
    P, N, M = 8, 48, 48
    _, _, S, T, n_len, m_len = _mk(P, N, M, 50, seed=9)
    mesh = make_mesh(2)
    with mesh:
        sc, _ = sharded_step(mesh, S, T, n_len, m_len)
    sc = np.asarray(sc)
    for p in range(P):
        s = "".join(chr(c) for c in S[p, 1:n_len[p]+1])
        t = "".join(chr(c) for c in T[p, 1:m_len[p]+1])
        assert sc[p] == _dp_score(s, t), p


@pytest.mark.parametrize("ndev", [2, 8])
def test_vcf_device_count_invariant(tmp_path, ndev):
    """The full pipeline's VCF must not depend on the mesh size — the TPU
    analog of the reference's thread-count-invariant output
    (Lancet.cc:305-310, 938-959). Runs windows -> VCF with the device DP
    sharded over 1 vs `ndev` virtual devices."""
    from test_shardrun import _mixed_corpus

    from lancet_tpu.config import Config
    from lancet_tpu.parallel.mesh import make_mesh
    from lancet_tpu.runner import run

    chrom_len = _mixed_corpus(tmp_path, seed=21, chrom_len=9000)
    cfg = Config(tumor_bam=f"{tmp_path}/tumor.bam",
                 normal_bam=f"{tmp_path}/normal.bam",
                 ref_fasta=f"{tmp_path}/ref.fa",
                 region=f"chr1:300-{chrom_len - 300}", num_threads=3)
    vcf_1 = run(cfg, command_line="t", date="D\n", engine="tpu",
                mesh=make_mesh(1))
    vcf_n = run(cfg, command_line="t", date="D\n", engine="tpu",
                mesh=make_mesh(ndev))
    vcf_plain = run(cfg, command_line="t", date="D\n", engine="tpu")
    assert vcf_1 == vcf_n
    assert vcf_plain == vcf_n
    assert sum(1 for l in vcf_n.splitlines() if not l.startswith("#")) > 0
