import math
import random

from lancet_tpu.engine.align import (GAP_EXTEND, GAP_OPEN, MATCH, MISMATCH,
                                     global_align_aff)
from lancet_tpu.engine.fet import fet_phred, kt_fisher_exact


def brute_two_tail(n11, n12, n21, n22):
    """Exact two-tail via enumeration (for sanity, not bit parity)."""
    n1_ = n11 + n12
    n_1 = n11 + n21
    n = n11 + n12 + n21 + n22

    def hyper(x):
        return (math.comb(n1_, x) * math.comb(n - n1_, n_1 - x)) / math.comb(n, n_1)

    q = hyper(n11)
    lo = max(0, n1_ + n_1 - n)
    hi = min(n1_, n_1)
    return sum(hyper(x) for x in range(lo, hi + 1) if hyper(x) <= q * 1.0000001)


def test_fet_basic():
    q, left, right, two = kt_fisher_exact(10, 10, 0, 10)
    assert 0 < q < 1
    assert abs(two - brute_two_tail(10, 10, 0, 10)) < 1e-9
    # no-test case
    assert kt_fisher_exact(0, 0, 0, 0)[0] == 1.0
    assert fet_phred(0, 0, 0, 0) == 0.0


def test_fet_phred_somatic_like():
    # RCN=20 RCT=10 ACN=0 ACT=10 -> strongly somatic, score > 5
    s = fet_phred(20, 10, 0, 10)
    assert s > 5.0


def score_alignment(s_aln, t_aln):
    """Score under the reference's convention: a leading gap costs
    GO + L*GE (boundary init), interior gaps GO + (L-1)*GE."""
    sc = 0
    in_gap_s = in_gap_t = False
    for col, (a, b) in enumerate(zip(s_aln, t_aln)):
        if a == "-":
            sc += GAP_EXTEND if in_gap_s else (GAP_OPEN + (GAP_EXTEND if col == 0 else 0))
            in_gap_s, in_gap_t = True, False
        elif b == "-":
            sc += GAP_EXTEND if in_gap_t else (GAP_OPEN + (GAP_EXTEND if col == 0 else 0))
            in_gap_t, in_gap_s = True, False
        else:
            sc += MATCH if a == b else MISMATCH
            in_gap_s = in_gap_t = False
    return sc


def brute_best_score(S, T):
    """O(nm) Gotoh without traceback for score verification."""
    NEG = -(10 ** 8)
    n, m = len(S), len(T)
    M = [[0] * (m + 1) for _ in range(n + 1)]
    X = [[NEG] * (m + 1) for _ in range(n + 1)]
    Y = [[NEG] * (m + 1) for _ in range(n + 1)]
    for j in range(m + 1):
        X[0][j] = GAP_OPEN + j * GAP_EXTEND
        M[0][j] = X[0][j]
    for i in range(n + 1):
        Y[i][0] = GAP_OPEN + i * GAP_EXTEND
        M[i][0] = Y[i][0]
    M[0][0] = 0
    X[0][0] = GAP_OPEN
    Y[0][0] = GAP_OPEN
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            X[i][j] = max(X[i - 1][j] + GAP_EXTEND, M[i - 1][j] + GAP_OPEN)
            Y[i][j] = max(Y[i][j - 1] + GAP_EXTEND, M[i][j - 1] + GAP_OPEN)
            sub = MATCH if S[i - 1] == T[j - 1] else MISMATCH
            M[i][j] = max(M[i - 1][j - 1] + sub, X[i][j], Y[i][j])
    return M[n][m]


def test_align_simple_snv():
    s_aln, t_aln = global_align_aff("ACGTACGT", "ACGAACGT")
    assert s_aln == "ACGTACGT" and t_aln == "ACGAACGT"


def test_align_deletion():
    s_aln, t_aln = global_align_aff("ACGTTTACGT", "ACGTACGT")
    assert s_aln.replace("-", "") == "ACGTTTACGT"
    assert t_aln.replace("-", "") == "ACGTACGT"
    assert t_aln.count("-") == 2


def test_align_scores_match_bruteforce_few_edits():
    """In lancet's regime (a path differing from the ref by a few edits)
    the traceback realizes the DP optimum. On strongly divergent strings
    the reference's traceback is suboptimal/UB — we replicate it
    bit-for-bit (fuzz-verified against the compiled reference: 0
    mismatches on 697 cases; see tools/check_align_parity.py)."""
    rng = random.Random(3)
    for _ in range(40):
        n = rng.randint(60, 200)
        S = "".join(rng.choice("ACGT") for _ in range(n))
        T = list(S)
        for _ in range(rng.randint(1, 4)):
            op = rng.choice("sid")
            p = rng.randint(10, len(T) - 10)
            if op == "s":
                T[p] = rng.choice("ACGT")
            elif op == "i":
                T.insert(p, rng.choice("ACGT"))
            else:
                del T[p]
        T = "".join(T)
        s_aln, t_aln = global_align_aff(S, T)
        assert s_aln.replace("-", "") == S
        assert t_aln.replace("-", "") == T
        assert score_alignment(s_aln, t_aln) == brute_best_score(S, T), (S, T)
