"""Adversarial verification of the metric stack.

The reference scores through coco-caption/coval (empty submodules here),
so bit-parity cannot be tested against the originals. Instead, each
scorer is INDEPENDENTLY re-implemented in this file from the algorithm
definition (CIDEr: Vedantam et al. 2015 + the canonical coco-caption
quirks; BLEU: Papineni et al. 2002 with pycocoevalcap's tiny/small
smoothing and closest-ref length; ROUGE-L: Lin 2004 with beta=1.2),
sharing NO code with ``vidsitu_tpu/evaluation/metrics/``, and the two
implementations are cross-checked on hundreds of randomized corpora to
~1e-12. A transcription bug in either implementation (idf sign, clip
direction, brevity-penalty branch, LCS off-by-one) breaks the agreement.

Coref (coval family) gets property tests: cluster/mention permutation
invariance, perfect-prediction fixpoints, independent MUC/B-cubed
re-derivations, and the lea_soft -> lea reduction at unit weights.
"""

import math
import random
from collections import Counter

import numpy as np
import pytest

from vidsitu_tpu.evaluation.metrics.bleu import Bleu
from vidsitu_tpu.evaluation.metrics.cider import Cider
from vidsitu_tpu.evaluation.metrics.rouge import Rouge
from vidsitu_tpu.evaluation.metrics import coref as cv


# ---------------------------------------------------------------------------
# independent implementations (no shared code with metrics/)
# ---------------------------------------------------------------------------


def _grams(words, n):
    return Counter(tuple(words[i : i + n]) for i in range(len(words) - n + 1))


def ind_cider(gts, res, nmax=4, sigma=6.0):
    """CIDEr-corpus from the paper + coco-caption quirks: idf over
    reference SETS, weight tf*(log N - log max(1,df)), clipped cosine
    accumulated over hypothesis n-grams, Gaussian penalty on the BIGRAM
    length delta (the canonical ``if n == 1`` 0-based-index quirk), mean
    over n, averaged over refs, x10."""
    ids = sorted(gts)
    hyps = [res[i][0].split() for i in ids]
    refsets = [[r.split() for r in gts[i]] for i in ids]
    ncorp = len(ids)
    df = Counter()
    for refs in refsets:
        seen = set()
        for r in refs:
            for n in range(1, nmax + 1):
                seen.update(_grams(r, n))
        df.update(seen)
    log_n = math.log(float(ncorp))

    def tfidf(words):
        gs, norms = [], []
        for n in range(1, nmax + 1):
            cnt = _grams(words, n)
            g = {
                ng: c * (log_n - math.log(max(1.0, df[ng])))
                for ng, c in cnt.items()
            }
            gs.append(g)
            norms.append(math.sqrt(sum(v * v for v in g.values())))
        blen = sum(_grams(words, 2).values())
        return gs, norms, blen

    per_sent = []
    for hyp, refs in zip(hyps, refsets):
        gh, nh, lh = tfidf(hyp)
        acc = np.zeros(nmax)
        for r in refs:
            gr, nr, lr = tfidf(r)
            pen = math.exp(-((lh - lr) ** 2) / (2.0 * sigma * sigma))
            for k in range(nmax):
                num = sum(
                    min(v, gr[k].get(ng, 0.0)) * gr[k].get(ng, 0.0)
                    for ng, v in gh[k].items()
                )
                if nh[k] != 0 and nr[k] != 0:
                    num /= nh[k] * nr[k]
                acc[k] += num * pen
        per_sent.append(float(np.mean(acc)) / len(refs) * 10.0)
    return float(np.mean(per_sent)), per_sent


def ind_bleu(gts, res, nmax=4):
    """Corpus BLEU-1..4 with pycocoevalcap smoothing: per-order clipped
    counts, geometric mean via cumulative product, tiny=1e-15 /
    small=1e-9 additive constants, closest-reference brevity penalty
    (tie -> shorter ref) applied only when ratio < 1."""
    tiny, small = 1e-15, 1e-9
    ids = sorted(gts)
    tot_correct, tot_guess = [0] * nmax, [0] * nmax
    tot_tl, tot_rl = 0, 0.0
    per_sent = [[] for _ in range(nmax)]
    for i in ids:
        hyp = res[i][0].split()
        refs = [r.split() for r in gts[i]]
        tl = len(hyp)
        rl = min((abs(len(r) - tl), len(r)) for r in refs)[1]
        correct, guess = [], []
        for k in range(1, nmax + 1):
            hc = _grams(hyp, k)
            clip = Counter()
            for r in refs:
                for ng, c in _grams(r, k).items():
                    clip[ng] = max(clip[ng], c)
            correct.append(sum(min(c, clip[ng]) for ng, c in hc.items()))
            guess.append(max(0, tl - k + 1))
        prod = 1.0
        sent = []
        for k in range(nmax):
            prod *= (correct[k] + tiny) / (guess[k] + small)
            sent.append(prod ** (1.0 / (k + 1)))
        ratio = (tl + tiny) / (rl + small)
        if ratio < 1:
            sent = [s * math.exp(1 - 1 / ratio) for s in sent]
        for k in range(nmax):
            per_sent[k].append(sent[k])
            tot_correct[k] += correct[k]
            tot_guess[k] += guess[k]
        tot_tl += tl
        tot_rl += rl
    prod, corpus = 1.0, []
    for k in range(nmax):
        prod *= (tot_correct[k] + tiny) / (tot_guess[k] + small)
        corpus.append(prod ** (1.0 / (k + 1)))
    ratio = (tot_tl + tiny) / (tot_rl + small)
    if ratio < 1:
        corpus = [s * math.exp(1 - 1 / ratio) for s in corpus]
    return corpus, per_sent


def ind_rouge_l(gts, res, beta=1.2):
    """ROUGE-L: LCS by full DP matrix (different algorithm than the
    rolling-row in metrics/rouge.py), MAX precision/recall over refs,
    F-beta. Tokenization is split(" ") as in pycocoevalcap (an empty
    string tokenizes to [''], not [])."""

    def lcs(a, b):
        m, n = len(a), len(b)
        dp = np.zeros((m + 1, n + 1), dtype=np.int64)
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                dp[i, j] = (
                    dp[i - 1, j - 1] + 1
                    if a[i - 1] == b[j - 1]
                    else max(dp[i - 1, j], dp[i, j - 1])
                )
        return int(dp[m, n])

    scores = []
    for i in sorted(gts):
        hyp = res[i][0].split(" ")
        best_p, best_r = 0.0, 0.0
        for ref in gts[i]:
            rtok = ref.split(" ")
            common = lcs(rtok, hyp)
            best_p = max(best_p, common / float(len(hyp)))
            best_r = max(best_r, common / float(len(rtok)))
        if best_p != 0 and best_r != 0:
            scores.append(
                (1 + beta**2) * best_p * best_r / (best_r + beta**2 * best_p)
            )
        else:
            scores.append(0.0)
    return float(np.mean(scores)), scores


# ---------------------------------------------------------------------------
# randomized corpora
# ---------------------------------------------------------------------------

VOCAB = [f"w{i}" for i in range(18)]


def rand_corpus(rng, n_sent=None, allow_empty=True):
    n_sent = n_sent or rng.randint(2, 24)
    gts, res = {}, {}
    for i in range(n_sent):
        key = f"s{i}"
        lo = 0 if allow_empty else 1

        def sent():
            k = rng.randint(lo, 10)
            return " ".join(rng.choice(VOCAB) for _ in range(k))

        res[key] = [sent()]
        gts[key] = [sent() for _ in range(rng.randint(1, 3))]
        if rng.random() < 0.25:
            # adversarial: hypothesis verbatim-equal to one reference
            res[key] = [rng.choice(gts[key])]
    return gts, res


def test_cider_matches_independent_impl_randomized():
    rng = random.Random(1234)
    ours = Cider()
    for trial in range(250):
        gts, res = rand_corpus(rng)
        mean_a, per_a = ours.compute_score(gts, res)
        mean_b, per_b = ind_cider(gts, res)
        np.testing.assert_allclose(mean_a, mean_b, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(per_a), np.asarray(per_b), rtol=1e-10, atol=1e-12
        )


def test_bleu_matches_independent_impl_randomized():
    rng = random.Random(99)
    ours = Bleu(4)
    for trial in range(250):
        gts, res = rand_corpus(rng)
        corpus_a, per_a = ours.compute_score(gts, res)
        corpus_b, per_b = ind_bleu(gts, res)
        np.testing.assert_allclose(corpus_a, corpus_b, rtol=1e-10, atol=1e-12)
        for k in range(4):
            np.testing.assert_allclose(
                per_a[k], per_b[k], rtol=1e-10, atol=1e-12
            )


def test_rouge_matches_independent_impl_randomized():
    rng = random.Random(7)
    ours = Rouge()
    for trial in range(250):
        gts, res = rand_corpus(rng)
        mean_a, per_a = ours.compute_score(gts, res)
        mean_b, per_b = ind_rouge_l(gts, res)
        np.testing.assert_allclose(mean_a, mean_b, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(per_a), np.asarray(per_b), rtol=1e-10, atol=1e-12
        )


# ---------------------------------------------------------------------------
# text-metric properties / edge cases
# ---------------------------------------------------------------------------


def test_cider_id_relabeling_invariance():
    """Scores depend on the (hyp, refs) multiset, not the id strings."""
    rng = random.Random(5)
    gts, res = rand_corpus(rng, n_sent=12)
    keys = sorted(gts)
    new_names = [f"z{i:02d}" for i in range(len(keys))]
    perm = list(range(len(keys)))
    rng.shuffle(perm)
    gts2 = {new_names[j]: gts[keys[p]] for j, p in enumerate(perm)}
    res2 = {new_names[j]: res[keys[p]] for j, p in enumerate(perm)}
    for scorer in (Cider(), Rouge()):
        m1, _ = scorer.compute_score(gts, res)
        m2, _ = scorer.compute_score(gts2, res2)
        np.testing.assert_allclose(m1, m2, rtol=1e-12)
    b1, _ = Bleu(4).compute_score(gts, res)
    b2, _ = Bleu(4).compute_score(gts2, res2)
    np.testing.assert_allclose(b1, b2, rtol=1e-12)


def test_cider_uniform_corpus_scores_zero():
    """Canonical idf quirk: when every n-gram appears in every document,
    idf = log N - log N = 0, so even a verbatim-perfect hypothesis scores
    0 — preserved from coco-caption."""
    gts = {f"s{i}": ["a b c d e"] for i in range(6)}
    res = {f"s{i}": ["a b c d e"] for i in range(6)}
    mean, per = Cider().compute_score(gts, res)
    assert mean == 0.0
    assert all(s == 0.0 for s in per)


def test_cider_single_document_corpus():
    """N=1: ref_len = log(1) = 0 and df of every hyp n-gram is 1, so all
    weights are 0 -> score 0 (degenerate but must not crash)."""
    mean, _ = Cider().compute_score({"a": ["x y z"]}, {"a": ["x y"]})
    assert mean == 0.0


def test_bleu_perfect_and_disjoint():
    gts = {"a": ["the cat sat down"], "b": ["dogs run fast ok"]}
    res_perfect = {"a": ["the cat sat down"], "b": ["dogs run fast ok"]}
    corpus, _ = Bleu(4).compute_score(gts, res_perfect)
    np.testing.assert_allclose(corpus, [1.0] * 4, atol=1e-6)
    res_disjoint = {"a": ["q q q q"], "b": ["p p p p"]}
    corpus, _ = Bleu(4).compute_score(gts, res_disjoint)
    assert all(c < 1e-3 for c in corpus)


def test_rouge_bounds_and_perfect():
    rng = random.Random(11)
    gts, res = rand_corpus(rng, n_sent=10, allow_empty=False)
    _, per = Rouge().compute_score(gts, res)
    assert all(0.0 <= s <= 1.0 for s in per)
    mean, _ = Rouge().compute_score(
        {"a": ["x y z"]}, {"a": ["x y z"]}
    )
    np.testing.assert_allclose(mean, 1.0)


# ---------------------------------------------------------------------------
# coref: independent re-derivations + property tests
# ---------------------------------------------------------------------------


def ind_muc(clusters, mention_to_gold):
    """MUC (Vilain et al. 1995) via the partition formulation:
    num = sum over clusters of |c| - p(c), where p(c) counts the
    partitions of c induced by the other side (each unaligned mention is
    its own partition); den = sum of |c| - 1."""
    num, den = 0, 0
    for c in clusters:
        parts = set()
        unaligned = 0
        for m in c:
            if m in mention_to_gold:
                parts.add(mention_to_gold[m])
            else:
                unaligned += 1
        p_c = len(parts) + unaligned
        num += len(c) - p_c
        den += len(c) - 1
    return num, den


def ind_b_cubed(clusters, mention_to_gold):
    """B-cubed (Bagga & Baldwin 1998) per-mention: for each mention m in
    cluster c, the fraction of c that shares m's gold cluster; mentions
    absent from gold contribute 0 to the numerator but count in |c|."""
    num, den = 0.0, 0
    for c in clusters:
        for m in c:
            if m in mention_to_gold:
                same = sum(
                    1
                    for m2 in c
                    if m2 in mention_to_gold
                    and mention_to_gold[m2] == mention_to_gold[m]
                )
                num += same / float(len(c))
        den += len(c)
    return num, den


def rand_clustering(rng, mentions):
    """Random partition of a random subset of `mentions`."""
    ms = [m for m in mentions if rng.random() < 0.9]
    rng.shuffle(ms)
    clusters = []
    i = 0
    while i < len(ms):
        k = rng.randint(1, 4)
        clusters.append(ms[i : i + k])
        i += k
    return [c for c in clusters if c]


def coref_info(key_clusters, sys_clusters):
    return (
        key_clusters,
        sys_clusters,
        cv.get_mention_assignments(key_clusters, sys_clusters),
        cv.get_mention_assignments(sys_clusters, key_clusters),
    )


def test_muc_bcubed_match_independent_impls_randomized():
    rng = random.Random(2024)
    mentions = [f"m{i}" for i in range(20)]
    for trial in range(200):
        key = rand_clustering(rng, mentions)
        sys = rand_clustering(rng, mentions)
        info = coref_info(key, sys)
        _, _, key_to_sys, sys_to_key = info
        for ours, theirs in ((cv.muc, ind_muc), (cv.b_cubed, ind_b_cubed)):
            pn, pd = ours(sys, sys_to_key)
            rn, rd = ours(key, key_to_sys)
            pn2, pd2 = theirs(sys, sys_to_key)
            rn2, rd2 = theirs(key, key_to_sys)
            np.testing.assert_allclose(
                [pn, pd, rn, rd], [pn2, pd2, rn2, rd2], rtol=1e-12
            )


def _all_f1s(key, sys, weights=None):
    out = {}
    for name, fn in cv.ALL_COREF_METRICS:
        ev = cv.Evaluator(fn)
        ev.update(
            coref_info(key, sys),
            cider_for_sys=weights if name == "lea_soft" else None,
        )
        out[name] = (ev.get_precision(), ev.get_recall(), ev.get_f1())
    return out


def test_coref_permutation_invariance_randomized():
    """Shuffling cluster order and mention order within clusters (with
    lea_soft weights shuffled consistently) changes nothing."""
    rng = random.Random(77)
    mentions = [f"m{i}" for i in range(16)]
    for trial in range(60):
        key = rand_clustering(rng, mentions)
        sys = rand_clustering(rng, mentions)
        w = [[rng.random() for _ in c] for c in sys]
        base = _all_f1s(key, sys, weights=w)

        order = list(range(len(sys)))
        rng.shuffle(order)
        sys2, w2 = [], []
        for ci in order:
            perm = list(range(len(sys[ci])))
            rng.shuffle(perm)
            sys2.append([sys[ci][j] for j in perm])
            w2.append([w[ci][j] for j in perm])
        key2 = [list(c) for c in key]
        rng.shuffle(key2)
        for c in key2:
            rng.shuffle(c)
        shuf = _all_f1s(key2, sys2, weights=w2)
        for name in base:
            np.testing.assert_allclose(
                base[name], shuf[name], rtol=1e-12,
                err_msg=f"{name} not permutation invariant",
            )


def test_coref_perfect_prediction_is_fixpoint():
    rng = random.Random(31)
    mentions = [f"m{i}" for i in range(15)]
    for trial in range(40):
        key = rand_clustering(rng, mentions)
        if not key:
            continue
        sys = [list(c) for c in key]
        out = _all_f1s(key, sys, weights=[[1.0] * len(c) for c in sys])
        for name in ("mentions", "bcub", "ceafe", "lea", "lea_soft"):
            np.testing.assert_allclose(
                out[name][2], 1.0, rtol=1e-12,
                err_msg=f"{name} != 1 on perfect prediction",
            )
        if any(len(c) > 1 for c in key):
            np.testing.assert_allclose(out["muc"][2], 1.0, rtol=1e-12)


def test_lea_soft_reduces_to_lea_at_unit_weights():
    rng = random.Random(13)
    mentions = [f"m{i}" for i in range(14)]
    for trial in range(60):
        key = rand_clustering(rng, mentions)
        sys = rand_clustering(rng, mentions)
        ones = [[1.0] * len(c) for c in sys]
        soft = _all_f1s(key, sys, weights=ones)["lea_soft"]
        hard = _all_f1s(key, sys)["lea"]
        np.testing.assert_allclose(soft, hard, rtol=1e-12)


def test_lea_soft_zero_weights_zero_precision():
    key = [["a", "b"], ["c"]]
    sys = [["a", "b"], ["c"]]
    out = _all_f1s(key, sys, weights=[[0.0, 0.0], [0.0]])
    assert out["lea_soft"][0] == 0.0  # precision
    np.testing.assert_allclose(out["lea_soft"][1], 1.0)  # recall unaffected


def test_lea_soft_weights_clip_to_unit_interval():
    key = [["a", "b"]]
    sys = [["a", "b"]]
    big = _all_f1s(key, sys, weights=[[10.0, 10.0]])["lea_soft"]
    one = _all_f1s(key, sys, weights=[[1.0, 1.0]])["lea_soft"]
    np.testing.assert_allclose(big, one, rtol=1e-12)
