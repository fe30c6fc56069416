"""Differential tests: retr_tpu.metrics vs a transcription of pycocoevalcap.

VERDICT round-1 item 1: the reference scores with nlg-eval's pycocoevalcap
scorers (/root/reference/engine.py:14-17,135-137,184-185); these tests pin the
native BLEU/CIDEr/ROUGE_L to a line-by-line transcription of those scorers
(tests/pycoco_oracle.py) on adversarial corpora: equidistant reference lengths
(the closest-length tie-break), repeated n-grams, empty hypotheses,
single-reference sets, and seeded random corpora. METEOR (no upstream Python
source — it is a Java jar) is pinned to hand-computed values of the documented
1.5 scheme plus structural corpus-aggregation properties.
"""

import math
import random

import pytest

from retr_tpu.metrics.bleu import corpus_bleu
from retr_tpu.metrics.cider import cider
from retr_tpu.metrics.meteor import ALPHA, BETA, GAMMA, MeteorStats, meteor, meteor_stats
from retr_tpu.metrics.rouge import rouge_l

from tests.pycoco_oracle import oracle_bleu, oracle_cider, oracle_rouge

# ---------------------------------------------------------------------------
# corpora
# ---------------------------------------------------------------------------

TIE_BREAK = (
    # hyp len 3; ref lens 2 and 4 are equidistant -> closest must pick 2 (shorter).
    # Listed longer-first so a first-wins tie-break gives a different reflen total.
    [["a b c d", "a b"], ["x y", "x y z w"]],
    ["a b x", "x y q"],
)

REPEATED_NGRAMS = (
    [["the the the the", "the cat the cat"], ["b b b"], ["a a a a a a"]],
    ["the the the", "b b b b b", "a a"],
)

EMPTY_HYPS = (
    [["a b c"], ["the cat sat", "a cat sat"], [""]],
    ["", "the cat sat", ""],
)

SINGLE_REF = (
    [["the red dog on the mat"], ["a small cat under the chair"], ["one word"]],
    ["the red dog", "a small cat under the chair", "word"],
)

CORPORA = [TIE_BREAK, REPEATED_NGRAMS, EMPTY_HYPS, SINGLE_REF]


def _random_corpus(seed, n_seg=60, vocab=("a", "b", "c", "dog", "cat", "the", "ran", "sat")):
    rng = random.Random(seed)
    refs, hyps = [], []
    for _ in range(n_seg):
        n_refs = rng.randint(1, 5)
        refs.append(
            [" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8))) for _ in range(n_refs)]
        )
        hyps.append(" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8))))
    return refs, hyps


CORPORA += [_random_corpus(s) for s in (0, 1, 2)]


# ---------------------------------------------------------------------------
# BLEU
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("idx", range(len(CORPORA)))
def test_bleu_matches_pycoco_oracle(idx):
    refs, hyps = CORPORA[idx]
    ours, _ = corpus_bleu(refs, hyps)
    oracle = oracle_bleu(refs, hyps)
    for o, e in zip(ours, oracle):
        assert o == pytest.approx(e, rel=1e-12, abs=1e-15)


def test_bleu_tiebreak_prefers_shorter_ref():
    # hyp len 3; refs len 4 (listed first) and len 2 equidistant.
    # shorter-wins -> reflen 2 -> testlen(3) > reflen(2) -> NO brevity penalty.
    # first-wins would pick 4 -> BP = exp(1 - 4/3) would shrink every order.
    refs = [["a b c d", "a b"]]
    hyps = ["a b x"]
    ours, _ = corpus_bleu(refs, hyps)
    assert ours[0] == pytest.approx((2 + 1e-15) / (3 + 1e-9), rel=1e-12)  # no BP applied


# ---------------------------------------------------------------------------
# CIDEr
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("idx", range(len(CORPORA)))
def test_cider_matches_pycoco_oracle(idx):
    refs, hyps = CORPORA[idx]
    ours_corpus, ours_per = cider(refs, hyps)
    oracle_corpus, oracle_per = oracle_cider(refs, hyps)
    assert ours_corpus == pytest.approx(oracle_corpus, rel=1e-12, abs=1e-15)
    for o, e in zip(ours_per, oracle_per):
        assert o == pytest.approx(e, rel=1e-12, abs=1e-15)


def test_cider_single_image_corpus_is_zero():
    # ref_len = log(1) = 0 makes every tf-idf weight 0 (upstream behavior).
    score, per = cider([["the cat sat", "a cat sat"]], ["the cat sat"])
    assert score == 0.0 and per == [0.0]


def test_cider_bigram_length_quirk():
    # Upstream "length" = bigram tf total (= max(L-1, 0)), not word count L.
    # Observationally equivalent to unigram counting: the deltas lh-lr only
    # differ when exactly one sentence is empty, where similarity is zero
    # anyway — but retr_tpu matches the upstream form exactly, pinned here on
    # the empty/one-word corpus that exercises both length branches.
    refs = [["a b c"], [""]]
    hyps = ["a", "a"]
    ours, per = cider(refs, hyps)
    oracle, operr = oracle_cider(refs, hyps)
    assert ours == pytest.approx(oracle, rel=1e-12, abs=1e-15)
    for o, e in zip(per, operr):
        assert o == pytest.approx(e, rel=1e-12, abs=1e-15)


# ---------------------------------------------------------------------------
# ROUGE_L
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("idx", range(len(CORPORA)))
def test_rouge_matches_pycoco_oracle(idx):
    refs, hyps = CORPORA[idx]
    ours_corpus, ours_per = rouge_l(refs, hyps)
    oracle_corpus, oracle_per = oracle_rouge(refs, hyps)
    assert ours_corpus == pytest.approx(oracle_corpus, rel=1e-12, abs=1e-15)
    for o, e in zip(ours_per, oracle_per):
        assert o == pytest.approx(e, rel=1e-12, abs=1e-15)


def test_rouge_empty_vs_empty_scores_one():
    # upstream split(" ") turns '' into [''] -> LCS 1 -> P=R=1 -> F=1.
    score, per = rouge_l([[""]], [""])
    assert per == [1.0]
    oracle, _ = oracle_rouge([[""]], [""])
    assert score == oracle == 1.0


# ---------------------------------------------------------------------------
# METEOR (1.5 scheme; hand-computed goldens + structural properties)
# ---------------------------------------------------------------------------

def _pen(chunks, matches):
    return GAMMA * (chunks / matches) ** BETA


def test_meteor_identical_sentence_golden():
    # "the cat sat": all matched exactly, one chunk; P=R=1 -> fMean=1;
    # score = 1 - gamma*(1/3)**beta (the 1.5 penalty does not vanish at identity).
    score, per = meteor([["the cat sat"]], ["the cat sat"])
    assert score == pytest.approx(1.0 - _pen(1, 3), abs=1e-12)
    assert per[0] == pytest.approx(score, abs=1e-12)


def test_meteor_stem_and_function_word_weighting_golden():
    # hyp "the dog running" vs ref "the dog runs":
    #   the (function, exact w=1.0*0.25), dog (content, exact w=1.0*0.75),
    #   running~runs (content, stem w=0.6*0.75); wLen = 2*0.75 + 0.25 = 1.75
    #   P = R = (0.25 + 0.75 + 0.45)/1.75; fMean = P (P==R); chunks=1, m=3.
    p = (0.25 + 0.75 + 0.45) / 1.75
    expected = p * (1.0 - _pen(1, 3))
    score, _ = meteor([["the dog runs"]], ["the dog running"])
    assert score == pytest.approx(expected, abs=1e-12)


def test_meteor_disjoint_is_zero():
    score, per = meteor([["entirely different sentence"]], ["the dog running"])
    assert score == 0.0 and per == [0.0]


def test_meteor_chunk_penalty_orders_scrambled_below_contiguous():
    # same unigrams, scrambled order -> more chunks -> lower score
    s_contig, _ = meteor([["red dog chases white cat"]], ["red dog chases white cat"])
    s_scram, _ = meteor([["red dog chases white cat"]], ["cat white chases dog red"])
    assert s_scram < s_contig


def test_meteor_corpus_is_aggregate_stats_not_mean_of_segments():
    refs = [["the cat sat"], ["a b c d"]]
    hyps = ["the cat sat", "x y z"]
    corpus_score, seg_scores = meteor(refs, hyps)
    stats, _ = meteor_stats(refs, hyps)
    assert corpus_score == pytest.approx(stats.score(), abs=1e-15)
    # aggregate-of-stats is NOT the mean of segment scores (jar semantics)
    assert corpus_score != pytest.approx(sum(seg_scores) / len(seg_scores), abs=1e-3)


def test_meteor_best_reference_selected():
    score_multi, _ = meteor([["zzz qqq www", "the cat sat"]], ["the cat sat"])
    score_single, _ = meteor([["the cat sat"]], ["the cat sat"])
    assert score_multi == pytest.approx(score_single, abs=1e-12)


def test_meteor_alignment_minimizes_chunks():
    # hyp "a b a": refs where greedy first-match would split chunks but the
    # chunk-minimizing aligner keeps "a b" contiguous.
    # ref "a b a": matches could map hyp[0]->ref[2] (greedy ambiguity);
    # optimal alignment is identity: 1 chunk.
    stats, _ = meteor_stats([["a b a"]], ["a b a"])
    assert stats.chunks == 1 and stats.test_total_matches == 3


def test_meteor_stats_are_summable():
    a, _ = meteor_stats([["the cat sat"]], ["the cat sat"])
    b, _ = meteor_stats([["a b c d"]], ["x y z"])
    both, _ = meteor_stats([["the cat sat"], ["a b c d"]], ["the cat sat", "x y z"])
    a.add(b)
    for f in MeteorStats.__slots__:
        assert getattr(a, f) == getattr(both, f)


def test_meteor_empty_hypothesis_zero():
    score, per = meteor([["a b"], ["c d"]], ["", "c d"])
    assert per[0] == 0.0 and 0.0 < score < 1.0
