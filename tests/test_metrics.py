"""Metric-stack unit tests with hand-checkable cases."""

import math

import numpy as np
import pytest

from vidsitu_tpu.evaluation.metrics.bleu import Bleu
from vidsitu_tpu.evaluation.metrics.cider import Cider
from vidsitu_tpu.evaluation.metrics.coref import (
    Evaluator,
    b_cubed,
    ceafe,
    get_mention_assignments,
    lea,
    lea_soft,
    mentions,
    muc,
)
from vidsitu_tpu.evaluation.metrics.rouge import Rouge

GTS = {
    0: ["a man walks", "a man is walking", "man walks in park"],
    1: ["a dog runs", "the dog is running", "dog runs fast"],
}


def test_bleu_perfect_and_range():
    res_perfect = {0: ["a man walks"], 1: ["a dog runs"]}
    bleus, sent = Bleu(4).compute_score(GTS, res_perfect)
    assert len(bleus) == 4
    assert bleus[0] == pytest.approx(1.0, abs=1e-6)
    # bleu_4 on 3-word sents: guess[3]=0 -> tiny/small ratio, far below 1
    assert 0 <= bleus[3] <= 1
    res_bad = {0: ["zebra quantum"], 1: ["xylophone"]}
    bleus_bad, _ = Bleu(4).compute_score(GTS, res_bad)
    assert bleus_bad[0] < 0.05


def test_bleu_brevity_penalty():
    gts = {0: ["a b c d e f"]}
    res = {0: ["a b c"]}
    bleus, _ = Bleu(4).compute_score(gts, res)
    # precision 1.0 for unigrams, but ratio=0.5 -> * exp(1-2)
    assert bleus[0] == pytest.approx(math.exp(-1.0), rel=1e-6)


def test_rouge_hand_case():
    r = Rouge()
    # candidate 'a man walks' vs single ref 'a man is walking':
    # lcs=2, prec=2/3, rec=2/4 -> F(beta=1.2)
    sc = r.calc_score(["a man walks"], ["a man is walking"])
    p, rc, b = 2 / 3, 2 / 4, 1.2
    expected = (1 + b * b) * p * rc / (rc + b * b * p)
    assert sc == pytest.approx(expected, rel=1e-9)
    assert r.calc_score(["a man walks"], ["a man walks"]) == 1.0
    assert r.calc_score([""], ["a man walks"]) == 0.0


def test_cider_identical_vs_disjoint():
    gts = {i: [f"sent {i} word alpha", f"sent {i} word beta"] for i in range(4)}
    res_same = {i: [gts[i][0]] for i in range(4)}
    c, cs = Cider("corpus").compute_score(gts, res_same)
    assert 0 < c <= 10
    res_diff = {i: ["zzz qqq xxx"] for i in range(4)}
    c2, _ = Cider("corpus").compute_score(gts, res_diff)
    assert c2 == pytest.approx(0.0, abs=1e-9)
    assert c > c2


def test_cider_exact_match_unique_refs_is_ten():
    # unique refs (df=1 everywhere), exact 4-word matches: every n-gram
    # order has nonzero norm and cosine 1 -> sentence score 10.0
    gts = {
        0: ["alpha beta gamma delta"],
        1: ["epsilon zeta eta theta"],
        2: ["iota kappa lam mu"],
        3: ["nu xi omicron pi"],
    }
    res = {i: [gts[i][0]] for i in range(4)}
    corp, sc = Cider("corpus").compute_score(gts, res)
    assert corp == pytest.approx(10.0, rel=1e-9)
    assert np.allclose(sc, 10.0)


# ----------------------------- coref ---------------------------------------


def clusters_simple():
    key = [["a", "b", "c"], ["d"]]
    sys = [["a", "b"], ["c"], ["d"]]
    k2s = get_mention_assignments(key, sys)
    s2k = get_mention_assignments(sys, key)
    return key, sys, k2s, s2k


def test_mention_and_muc():
    key, sys, k2s, s2k = clusters_simple()
    assert mentions(sys, s2k) == (4, 4)
    # muc recall: key cluster {a,b,c}: tp = 3 - partitions... muc(key, k2s)
    rn, rd = muc(key, k2s)
    assert (rn, rd) == (1, 2)
    pn, pd = muc(sys, s2k)
    assert (pn, pd) == (1, 1)


def test_bcubed_hand():
    key, sys, k2s, s2k = clusters_simple()
    rn, rd = b_cubed(key, k2s)
    # key cluster1: a,b->sys0, c->sys1: (2^2 + 1)/3; cluster2: 1
    assert rn == pytest.approx((4 + 1) / 3 + 1)
    assert rd == 4


def test_ceafe_perfect():
    key = [["a", "b"], ["c", "d"]]
    pn, pd, rn, rd = ceafe(key, key)
    assert pn == pytest.approx(2.0)
    assert (pd, rd) == (2, 2)


def test_lea_perfect_and_partial():
    key = [["a", "b", "c"], ["d"]]
    k2s = get_mention_assignments(key, key)
    n, d = lea(key, key, k2s)
    assert n == pytest.approx(4.0) and d == 4
    key2, sys2, k2s2, s2k2 = clusters_simple()
    pn, pd = lea(sys2, key2, s2k2)
    # sys {a,b}: 1/1 link correct ->2*1; {c}: singleton, gold cluster not
    # singleton -> 0; {d}: singleton matching singleton gold -> 1
    assert pn == pytest.approx(2 + 0 + 1)
    assert pd == 4


def test_lea_soft_reduces_to_lea_and_weights():
    key = [["a", "b"], ["c"]]
    k2s = get_mention_assignments(key, key)
    n0, d0 = lea(key, key, k2s)
    n1, d1 = lea_soft(key, key, k2s, mention_weights=None)
    assert (n0, d0) == (n1, d1)
    n2, d2 = lea_soft(key, key, k2s, mention_weights=[[0.5, 0.5], [1.0]])
    assert d2 == d0
    assert n2 < n0  # downweighted links
    # weights clipped to [0,1]
    n3, _ = lea_soft(key, key, k2s, mention_weights=[[5.0, 5.0], [9.0]])
    assert n3 == pytest.approx(n0)


def test_evaluator_accumulation():
    ev = Evaluator(muc)
    key, sys, k2s, s2k = clusters_simple()
    ev.update((key, sys, k2s, s2k))
    ev.update((key, key, get_mention_assignments(key, key), get_mention_assignments(key, key)))
    f1v = ev.get_f1()
    assert 0 < f1v <= 1
