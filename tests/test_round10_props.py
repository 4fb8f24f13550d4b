"""Property tests for the round-10 operators: each one's algebraic contract
checked against a brute-force or conservation-law reference on randomized
inputs — the net under the oracle specs (which pin one dataset per sf)."""

from __future__ import annotations

import math
import random
from fractions import Fraction

import pytest


# ---------------------------------------------------------------------------
# ks_drift_value: the integer-lattice sup equals the rational sup |F1 - F2|
# ---------------------------------------------------------------------------
def _ks_lattice(s1, s2):
    """The spec's formula: per distinct pooled value, max |cum1*n2 - cum2*n1|
    then divide — all integer until the final division."""
    n1, n2 = len(s1), len(s2)
    vals = sorted(set(s1) | set(s2))
    c1 = c2 = 0
    best = 0
    from collections import Counter

    m1, m2 = Counter(s1), Counter(s2)
    for v in vals:
        c1 += m1.get(v, 0)
        c2 += m2.get(v, 0)
        best = max(best, abs(c1 * n2 - c2 * n1))
    return Fraction(best, n1 * n2)


def _ks_direct(s1, s2):
    """Textbook sup over x of |F1(x) - F2(x)| evaluated at sample points."""
    n1, n2 = len(s1), len(s2)
    pool = sorted(set(s1) | set(s2))
    best = Fraction(0)
    for x in pool:
        f1 = Fraction(sum(1 for v in s1 if v <= x), n1)
        f2 = Fraction(sum(1 for v in s2 if v <= x), n2)
        best = max(best, abs(f1 - f2))
    return best


@pytest.mark.parametrize("seed", range(30))
def test_ks_lattice_equals_direct_sup(seed):
    rng = random.Random(seed)
    n1, n2 = rng.randint(1, 40), rng.randint(1, 40)
    # heavy ties: small value domain
    s1 = [rng.randint(0, 8) for _ in range(n1)]
    s2 = [rng.randint(0, 12) for _ in range(n2)]
    assert _ks_lattice(s1, s2) == _ks_direct(s1, s2)


def test_ks_identical_samples_is_zero():
    s = [1, 2, 2, 3, 7]
    assert _ks_lattice(s, list(s)) == 0


def test_ks_disjoint_samples_is_one():
    assert _ks_lattice([1, 2, 3], [10, 11]) == 1


# ---------------------------------------------------------------------------
# decile_lift: the explicit cut floor((i-1)*k/n)+1 partitions 1..n into k
# buckets with sizes differing by at most 1, in rank order; and cumulative
# lift at the last decile is exactly 1.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", range(25))
def test_decile_cut_partitions_evenly(seed):
    rng = random.Random(seed)
    n = rng.randint(1, 500)
    k = rng.choice([2, 4, 10])
    buckets = [(i - 1) * k // n + 1 for i in range(1, n + 1)]
    assert buckets == sorted(buckets)
    assert set(buckets) <= set(range(1, k + 1))
    sizes = [buckets.count(b) for b in sorted(set(buckets))]
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == n
    if n >= k:
        assert len(set(buckets)) == k  # every decile non-empty


@pytest.mark.parametrize("seed", range(10))
def test_decile_lift_final_cum_is_one(seed):
    """Mirror decile_lift's formula end-to-end on a random ranked response
    vector (ADVICE r7: the old form asserted Fraction(r,n)/Fraction(r,n)==1
    without touching the operator's logic): cut ranks 1..n into deciles with
    floor((i-1)*k/n)+1, accumulate per-decile counts in rank order, and check
    the cumulative series against prefix sums — the last decile's cumulative
    lift must be exactly 1 because it covers every row."""
    rng = random.Random(seed)
    n = rng.randint(10, 300)
    k = 10
    resp = [rng.randint(0, 1) for _ in range(n)]
    if sum(resp) == 0:
        resp[rng.randrange(n)] = 1
    r = sum(resp)
    # the operator's decile cut over ranks i = 1..n (resp already rank-ordered)
    by_dec: dict[int, list[int]] = {}
    for i, x in enumerate(resp, start=1):
        by_dec.setdefault((i - 1) * k // n + 1, []).append(x)
    decs = sorted(by_dec)
    cum_users = cum_resp = 0
    for d in decs:
        cum_users += len(by_dec[d])
        cum_resp += sum(by_dec[d])
        # prefix-sum identity: the theta-join cumulative equals the flat prefix
        assert cum_users == sum(len(by_dec[e]) for e in decs if e <= d)
        assert cum_resp == sum(sum(by_dec[e]) for e in decs if e <= d)
        lift = Fraction(cum_resp, cum_users) / Fraction(r, n)
        if d == decs[-1]:
            assert cum_users == n and cum_resp == r and lift == 1
        else:
            assert lift >= 0


# ---------------------------------------------------------------------------
# kn_bigram_perplexity: conservation law — for every SEEN context a, the
# model's probability mass over the training vocabulary is
# 1 - (d·N1+(a·)/ca)·(1/(N1tot+V+1)) exactly (rational arithmetic), hence
# strictly inside (0, 1); the held-back mass is what the +1 continuation
# smoothing hands to unseen tokens.
# ---------------------------------------------------------------------------
def _kn_tables(bigrams):
    from collections import Counter

    cab = Counter(bigrams)
    ca = Counter()
    n1a = Counter()
    n1b = Counter()
    for (a, b), c in cab.items():
        ca[a] += c
        n1a[a] += 1
        n1b[b] += 1
    vocab = sorted({a for a, _ in bigrams} | {b for _, b in bigrams})
    return cab, ca, n1a, n1b, len(cab), vocab


@pytest.mark.parametrize("seed", range(25))
def test_kn_probability_mass_conserved(seed):
    rng = random.Random(seed)
    toks = [f"t{rng.randint(0, 9)}" for _ in range(rng.randint(2, 120))]
    bigrams = list(zip(toks, toks[1:]))
    cab, ca, n1a, n1b, n1tot, vocab = _kn_tables(bigrams)
    d = Fraction(3, 4)
    denom_c = n1tot + len(vocab) + 1

    def pcont(b):
        return Fraction(n1b.get(b, 0) + 1, denom_c)

    for a in ca:
        mass = sum(
            Fraction(max(cab.get((a, b), 0) * 4 - 3, 0), 4) / ca[a]
            + (d * n1a[a] / ca[a]) * pcont(b)
            for b in vocab
        )
        expected = 1 - (d * n1a[a] / ca[a]) * Fraction(1, denom_c)
        assert mass == expected
        assert 0 < mass < 1


def test_kn_unseen_context_backs_off_to_continuation():
    bigrams = [("a", "b"), ("b", "c")]
    _, ca, _, n1b, n1tot, vocab = _kn_tables(bigrams)
    assert "z" not in ca  # unseen context → P(b|z) = Pcont(b) by definition
    denom_c = n1tot + len(vocab) + 1
    assert Fraction(n1b["c"] + 1, denom_c) > Fraction(n1b.get("z", 0) + 1, denom_c)


# ---------------------------------------------------------------------------
# naive_bayes_lang: integer micro-nat scores make the argmax invariant under
# any summation order (the float version is not), and the quantization can
# only flip an argmax decided by a margin below k·1e-6 nats.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", range(25))
def test_nb_integer_scores_permutation_invariant(seed):
    rng = random.Random(seed)
    terms = [
        int(math.floor(1e6 * math.log(rng.uniform(1e-9, 1.0))))
        for _ in range(rng.randint(1, 200))
    ]
    total = sum(terms)
    for _ in range(5):
        rng.shuffle(terms)
        assert sum(terms) == total  # exact — floats would drift here


def test_nb_quantized_argmax_matches_exact_on_clear_margins():
    # two language scores whose true ln-margin is far above the quantizer
    # resolution: floor-quantization must preserve the argmax
    probs_a = [0.5, 0.25, 0.125]
    probs_b = [0.01, 0.01, 0.01]
    exact_a = sum(math.log(p) for p in probs_a)
    exact_b = sum(math.log(p) for p in probs_b)
    q_a = sum(int(math.floor(1e6 * math.log(p))) for p in probs_a)
    q_b = sum(int(math.floor(1e6 * math.log(p))) for p in probs_b)
    assert (exact_a > exact_b) == (q_a > q_b)
