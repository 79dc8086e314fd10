"""METEOR scorer tests: nltk parity (synonym stage disabled) + behavior.

nltk's meteor_score implements the identical classic formulation
(alpha=0.9, beta=3, gamma=0.5; greedy stage-wise alignment; chunk runs);
passing a no-op wordnet and the ORIGINAL_ALGORITHM Porter stemmer makes
it compute exactly our exact+stem variant.
"""

import numpy as np
import pytest

from vidsitu_tpu.evaluation.metrics.meteor import (
    Meteor,
    PorterStemmer,
    meteor_sentence,
)

nltk = pytest.importorskip("nltk")


class _NoWordnet:
    def synsets(self, word):
        return []


def _nltk_meteor(refs, hyp):
    from nltk.stem.porter import PorterStemmer as NltkPorter
    from nltk.translate.meteor_score import meteor_score

    return meteor_score(
        [r.split() for r in refs],
        hyp.split(),
        stemmer=NltkPorter(mode="ORIGINAL_ALGORITHM"),
        wordnet=_NoWordnet(),
    )


CASES = [
    (["the cat sat on the mat"], "the cat sat on the mat"),
    (["the cat sat on the mat"], "the cat was sitting on a mat"),
    (["a man is driving a car down the road"], "the man drives his car"),
    (["two dogs running through a field"], "dogs run across the field"),
    (["it is a cat"], "non overlapping words entirely"),
    (["the quick brown fox jumps over the lazy dog"],
     "a quick brown dog jumps over the fox"),
    (["children playing happily in gardens"],
     "a child played happy in a garden"),
]


@pytest.mark.parametrize("refs,hyp", CASES)
def test_matches_nltk_without_synonyms(refs, hyp):
    ours = meteor_sentence(hyp, refs)
    theirs = _nltk_meteor(refs, hyp)
    assert ours == pytest.approx(theirs, abs=1e-9), (refs, hyp)


def test_multi_reference_takes_max():
    refs = ["completely different text here", "the cat sat on the mat"]
    hyp = "the cat sat on the mat"
    assert meteor_sentence(hyp, refs) == pytest.approx(
        meteor_sentence(hyp, [refs[1]])
    )


def test_porter_stemmer_matches_nltk_original_mode():
    from nltk.stem.porter import PorterStemmer as NltkPorter

    ref = NltkPorter(mode="ORIGINAL_ALGORITHM")
    ours = PorterStemmer()
    words = (
        "caresses ponies ties caress cats feed agreed plastered bled "
        "motoring sing conflated troubled sized hopping tanned falling "
        "hissing fizzed failing filing happy sky relational conditional "
        "rational valenci hesitanci digitizer conformabli radicalli "
        "differentli vileli analogousli vietnamization predication "
        "operator feudalism decisiveness hopefulness callousness "
        "formaliti sensitiviti sensibiliti triplicate formative formalize "
        "electriciti electrical hopeful goodness revival allowance "
        "inference airliner gyroscopic adjustable defensible irritant "
        "replacement adjustment dependent adoption homologou communism "
        "activate angulariti homologi effective bowdlerize probate rate "
        "cease controll roll driving dying lying generalization "
        "oscillators"
    ).split()
    for w in words:
        assert ours.stem(w) == ref.stem(w), w


def test_scorer_api():
    m = Meteor()
    gts = {0: ["the cat sat"], 1: ["a dog ran fast"]}
    res = {0: ["the cat sat"], 1: ["the dog runs"]}
    mean, scores = m.compute_score(gts, res)
    assert len(scores) == 2
    assert mean == pytest.approx(float(np.mean(scores)))
    assert scores[0] > 0.9


def test_meteor_available_in_scorer_registry(tmp_path):
    from vidsitu_tpu.data.synth import make_synth_dataset
    from vidsitu_tpu.evaluation.evl_fns import EvalFnCap
    from vidsitu_tpu.utils.config import get_cfg_with_overrides

    paths = make_synth_dataset(tmp_path, n_train=4, n_valid=3, seed=5)
    cfg = get_cfg_with_overrides("met", **paths)
    evl = EvalFnCap(cfg, None, met_keys=["cider", "meteor"])
    assert "meteor" in evl.scorers
