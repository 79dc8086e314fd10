"""METEOR optional synonym stage (external WordNet-layout data hook).

The reference's METEOR jar carries WordNet synonym/paraphrase stages
(coco-caption scorer registry, ref evl_fns.py:410-432); the data is not
vendorable, so our scorer accepts it externally — these tests drive the
stage with a tiny fabricated synonym table in each supported format.
"""

import json

import numpy as np

from vidsitu_tpu.evaluation.metrics.meteor import (
    Meteor,
    SynonymTable,
    meteor_sentence,
)

TABLE = {
    "cat": ["noun.100001"],
    "feline": ["noun.100001"],
    "dog": ["noun.200002"],
    "run": ["verb.300003"],
    "sprint": ["verb.300003"],
}


def test_synonym_match_completes_alignment():
    syn = SynonymTable(TABLE)
    with_syn = meteor_sentence(
        "the feline sat", ["the cat sat"], syn_table=syn
    )
    without = meteor_sentence("the feline sat", ["the cat sat"])
    perfect = meteor_sentence("the cat sat", ["the cat sat"])
    assert with_syn > without
    # feline<->cat aligns in place -> one contiguous chunk, i.e. exactly
    # the perfect-alignment score
    np.testing.assert_allclose(with_syn, perfect, rtol=1e-12)


def test_synonym_stage_sees_stemmed_leftovers():
    """nltk stage order: the synonym lookup operates on the stem stage's
    leftovers, so inflected forms resolve through their stems."""
    syn = SynonymTable(TABLE)
    # "sprinting" stems to "sprint", which shares a synset with "run"
    s = meteor_sentence("he was sprinting", ["he was run"], syn_table=syn)
    base = meteor_sentence("he was sprinting", ["he was run"])
    assert s > base


def test_default_is_exact_plus_stem_only():
    m = Meteor(synonyms=None)
    assert m.syn_table is None
    # unrelated words never match without data
    assert meteor_sentence("feline", ["cat"]) == 0.0


def test_json_path_and_env_hook(tmp_path, monkeypatch):
    p = tmp_path / "syn.json"
    p.write_text(json.dumps(TABLE))
    m = Meteor(synonyms=str(p))
    assert m.syn_table.synonyms("cat", "feline")
    # registry-style default: $VIDSITU_METEOR_SYNONYMS enables the stage
    monkeypatch.setenv("VIDSITU_METEOR_SYNONYMS", str(p))
    m_env = Meteor()
    assert m_env.syn_table is not None
    mean, _ = m_env.compute_score(
        {"a": ["the cat sat"]}, {"a": ["the feline sat"]}
    )
    mean_off, _ = Meteor(synonyms=None).compute_score(
        {"a": ["the cat sat"]}, {"a": ["the feline sat"]}
    )
    assert mean > mean_off
    monkeypatch.delenv("VIDSITU_METEOR_SYNONYMS")
    assert Meteor().syn_table is None


def test_wordnet_corpus_layout(tmp_path):
    """index.{pos} files in the nltk WordNet layout parse into the
    table: last synset_cnt fields are the offsets."""
    wn = tmp_path / "wordnet"
    wn.mkdir()
    (wn / "index.noun").write_text(
        "  1 This is a license header line\n"
        "  2 more header\n"
        "cat n 2 1 @ 2 1 02121620 02985606\n"
        "feline n 1 1 @ 1 0 02121620\n"
        "dog n 1 1 @ 1 1 02084071\n"
    )
    (wn / "index.verb").write_text(
        "run v 1 1 @ 1 1 01926311\n"
        "sprint v 1 1 @ 1 0 01926311\n"
    )
    # a zero-synset line must not pollute the table (fields[-0:] trap)
    (wn / "index.adj").write_text("weird a 0 0 0 0\nother a 0 0 0 0\n")
    t = SynonymTable.from_wordnet_dir(wn)
    assert not t.ids("weird") and not t.synonyms("weird", "other")
    assert t.synonyms("cat", "feline")
    assert not t.synonyms("cat", "dog")
    assert t.synonyms("run", "sprint")
    assert not t.synonyms("run", "cat")
    # SynonymTable.load dispatches on directory
    m = Meteor(synonyms=str(wn))
    assert m.syn_table.synonyms("cat", "feline")
