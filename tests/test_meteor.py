"""METEOR (evals/meteor.py): hand-computed cases + NLTK as an independent
oracle (the reference's meteor-1.5.jar is absent upstream, so the published
algorithm + NLTK cross-check is the strongest available parity)."""

import numpy as np
import pytest

from youku_mplug_tpu.evals.meteor import Meteor, meteor_score, segment_stats


def test_perfect_match():
    # P=R=1, one chunk, frag=1/m
    s = meteor_score("the cat sat", ["the cat sat"])
    m, h, r, c = 3, 3, 3, 1
    fmean = 1.0
    expected = fmean * (1 - 0.5 * (c / m) ** 3)
    assert abs(s - expected) < 1e-12


def test_no_match():
    assert meteor_score("a b c", ["x y z"]) == 0.0
    assert meteor_score("", ["x"]) == 0.0


def test_hand_computed_partial():
    # hyp: "the cat on mat", ref: "the cat sat on the mat"
    # back-to-front greedy (NLTK convention): mat->mat(5), on->on(3),
    # cat->cat(1), the->the(4, the LAST unmatched "the") = 4 matches at
    # hyp idx (0,1,2,3) ref idx (4,1,3,5) -> no contiguous-monotone run,
    # 4 chunks
    hyp, ref = "the cat on mat", "the cat sat on the mat"
    m, hl, rl, c = segment_stats(hyp.split(), [ref.split()])
    assert (m, hl, rl, c) == (4, 4, 6, 4)
    p, r = 4 / 4, 4 / 6
    fmean = p * r / (0.9 * p + 0.1 * r)
    expected = fmean * (1 - 0.5 * (4 / 4) ** 3)
    assert abs(meteor_score(hyp, [ref]) - expected) < 1e-12


def test_multi_reference_takes_best():
    hyp = "a b c d"
    assert meteor_score(hyp, ["x y", "a b c d"]) == \
        meteor_score(hyp, ["a b c d"])


@pytest.mark.parametrize("seed", range(6))
def test_matches_nltk_exact_stage(seed):
    nltk = pytest.importorskip("nltk")
    from nltk.translate.meteor_score import single_meteor_score

    class _NoWordnet:
        def synsets(self, w):
            return []

    class _NoStem:
        def stem(self, w):
            return w

    rng = np.random.default_rng(seed)
    vocab = list("abcdefgh")
    hyp = [vocab[i] for i in rng.integers(0, 8, rng.integers(3, 12))]
    ref = [vocab[i] for i in rng.integers(0, 8, rng.integers(3, 12))]
    want = single_meteor_score(ref, hyp, stemmer=_NoStem(),
                               wordnet=_NoWordnet())
    got = meteor_score(" ".join(hyp), [" ".join(ref)])
    assert abs(got - want) < 1e-12, (hyp, ref)


@pytest.mark.parametrize("seed", range(4))
def test_matches_nltk_with_porter_stemmer(seed):
    nltk = pytest.importorskip("nltk")
    from nltk.stem.porter import PorterStemmer
    from nltk.translate.meteor_score import single_meteor_score

    class _NoWordnet:
        def synsets(self, w):
            return []

    rng = np.random.default_rng(100 + seed)
    vocab = ["run", "running", "runs", "cat", "cats", "quickly", "quick",
             "jumped", "jump", "the"]
    hyp = [vocab[i] for i in rng.integers(0, len(vocab),
                                          rng.integers(4, 10))]
    ref = [vocab[i] for i in rng.integers(0, len(vocab),
                                          rng.integers(4, 10))]
    ps = PorterStemmer()
    want = single_meteor_score(ref, hyp, stemmer=ps, wordnet=_NoWordnet())
    got = meteor_score(" ".join(hyp), [" ".join(ref)], stemmer=ps.stem)
    assert abs(got - want) < 1e-12, (hyp, ref)


def test_scorer_interface():
    gts = {1: ["a b c"], 2: ["x y z w"]}
    res = {1: ["a b c"], 2: ["x q z w"]}
    corpus, scores = Meteor().compute_score(gts, res)
    assert len(scores) == 2 and scores[0] > scores[1] > 0
    assert 0 < corpus < 1


def test_chinese_char_tokens():
    # the project's char-level contract: tokens are characters
    gt = " ".join("今天天气很好")
    hyp = " ".join("今天天气好")
    s = meteor_score(hyp, [gt])
    assert 0.5 < s < 1.0


def test_synonym_stage():
    syn = {"car": {"automobile"}, "automobile": {"car"}}
    s_without = meteor_score("the car", ["the automobile"])
    s_with = meteor_score("the car", ["the automobile"],
                          synonyms=lambda w: syn.get(w, set()))
    assert s_with > s_without
