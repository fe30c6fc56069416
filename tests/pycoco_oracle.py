"""Test-only oracle: faithful transcription of the pycocoevalcap scorers.

The reference scores generations with Maluuba nlg-eval
(/root/reference/engine.py:14-17,135-137,184-185), which wraps the pycocoevalcap
scorers (BLEU from bleu_scorer.py, CIDEr from cider_scorer.py, ROUGE_L from
rouge.py).  Those packages are not installed in this image, so this module is a
careful line-by-line transcription of their published algorithms, used ONLY by
tests to differentially validate retr_tpu.metrics.  It is deliberately written
in the upstream's own style (accumulator dicts, tuple-min tie-breaks, split(" "))
rather than retr_tpu's, so a shared misreading is less likely.

Upstream algorithms transcribed:
  - pycocoevalcap/bleu/bleu_scorer.py  (BleuScorer, option='closest' as used by
    Bleu.compute_score): per-segment closest reference length with ties broken
    toward the SHORTER reference via min over (abs(diff), len) tuples; corpus
    totals with tiny=1e-15 / small=1e-9 smoothing; progressive product over
    orders; brevity penalty exp(1 - 1/ratio) applied when
    ratio = (testlen + tiny) / (reflen + small) < 1.
  - pycocoevalcap/cider/cider_scorer.py (CiderScorer, n=4, sigma=6): df counted
    once per image over the union of its references' n-grams; ref_len =
    log(len(corpus)); tf-idf vec[n][ngram] = tf * (ref_len - log(max(df,1)));
    "length" is the BIGRAM term-frequency total (the upstream `if n == 1`
    quirk, n being len(ngram)-1); min-clipped vector product normalized by both
    norms; gaussian delta penalty; mean over n, / len(refs), * 10.
  - pycocoevalcap/rouge/rouge.py (Rouge, beta=1.2): split(" ") tokenization
    (NOT split(): empty strings become ['']), standard LCS table, max precision
    and max recall over references combined by the weighted F-measure.

This file is never imported by the framework.
"""

from __future__ import annotations

import math
from collections import defaultdict


# --------------------------------------------------------------------------
# BLEU — transcription of bleu_scorer.py (BleuScorer with option='closest')
# --------------------------------------------------------------------------

def _bleu_precook(s, n=4):
    words = s.split()
    counts = defaultdict(int)
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            ngram = tuple(words[i:i + k])
            counts[ngram] += 1
    return (len(words), counts)


def _bleu_cook_refs(refs, n=4):
    reflen = []
    maxcounts = {}
    for ref in refs:
        rl, counts = _bleu_precook(ref, n)
        reflen.append(rl)
        for (ngram, count) in counts.items():
            maxcounts[ngram] = max(maxcounts.get(ngram, 0), count)
    return (reflen, maxcounts)


def _bleu_cook_test(test, reflen_maxcounts, n=4):
    reflen, refmaxcounts = reflen_maxcounts
    testlen, counts = _bleu_precook(test, n)
    result = {}
    result["reflen"] = reflen  # list; resolved per-option in compute
    result["testlen"] = testlen
    result["guess"] = [max(0, testlen - k + 1) for k in range(1, n + 1)]
    result["correct"] = [0] * n
    for (ngram, count) in counts.items():
        result["correct"][len(ngram) - 1] += min(refmaxcounts.get(ngram, 0), count)
    return result


def _single_reflen(reflens, option, testlen):
    if option == "shortest":
        return min(reflens)
    if option == "average":
        return float(sum(reflens)) / len(reflens)
    if option == "closest":
        # upstream: min((abs(l-testlen), l) for l in reflens)[1]
        # -> ties on |l - testlen| break toward the SHORTER reference.
        return min((abs(l - testlen), l) for l in reflens)[1]
    raise ValueError(option)


def oracle_bleu(references, hypotheses, n=4, option="closest"):
    """references[i] = list of ref strings for segment i. Returns [Bleu_1..Bleu_n]."""
    assert len(references) == len(hypotheses)
    ctest = []
    for refs, hyp in zip(references, hypotheses):
        ctest.append(_bleu_cook_test(hyp, _bleu_cook_refs(refs, n), n))

    small = 1e-9
    tiny = 1e-15
    total_testlen = 0.0
    total_reflen = 0.0
    totalcomps = {"guess": [0] * n, "correct": [0] * n}
    for comps in ctest:
        testlen = comps["testlen"]
        total_testlen += testlen
        total_reflen += _single_reflen(comps["reflen"], option, testlen)
        for key in ("guess", "correct"):
            for k in range(n):
                totalcomps[key][k] += comps[key][k]

    bleus = []
    bleu = 1.0
    for k in range(n):
        bleu *= (float(totalcomps["correct"][k]) + tiny) / (float(totalcomps["guess"][k]) + small)
        bleus.append(bleu ** (1.0 / (k + 1)))
    ratio = (total_testlen + tiny) / (total_reflen + small)
    if ratio < 1:
        for k in range(n):
            bleus[k] *= math.exp(1 - 1 / ratio)
    return bleus


# --------------------------------------------------------------------------
# CIDEr — transcription of cider_scorer.py (CiderScorer, n=4, sigma=6.0)
# --------------------------------------------------------------------------

def _cider_precook(s, n=4):
    words = s.split()
    counts = defaultdict(int)
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            ngram = tuple(words[i:i + k])
            counts[ngram] += 1
    return counts


def oracle_cider(references, hypotheses, n=4, sigma=6.0):
    """Returns (corpus_mean, per_segment_scores)."""
    crefs = [[_cider_precook(r, n) for r in refs] for refs in references]
    ctest = [_cider_precook(h, n) for h in hypotheses]

    document_frequency = defaultdict(float)
    for refs in crefs:
        for ngram in set(ng for ref in refs for ng in ref.keys()):
            document_frequency[ngram] += 1

    ref_len = math.log(float(len(crefs)))

    def counts2vec(cnts):
        vec = [defaultdict(float) for _ in range(n)]
        length = 0
        norm = [0.0] * n
        for (ngram, term_freq) in cnts.items():
            df = math.log(max(1.0, document_frequency[ngram]))
            k = len(ngram) - 1
            vec[k][ngram] = float(term_freq) * (ref_len - df)
            norm[k] += pow(vec[k][ngram], 2)
            if k == 1:  # upstream quirk: "length" counts BIGRAM term freqs
                length += term_freq
        norm = [math.sqrt(x) for x in norm]
        return vec, norm, length

    def sim(vec_hyp, vec_ref, norm_hyp, norm_ref, length_hyp, length_ref):
        delta = float(length_hyp - length_ref)
        val = [0.0] * n
        for k in range(n):
            for (ngram, count) in vec_hyp[k].items():
                val[k] += min(vec_hyp[k][ngram], vec_ref[k][ngram]) * vec_ref[k][ngram]
            if (norm_hyp[k] != 0) and (norm_ref[k] != 0):
                val[k] /= (norm_hyp[k] * norm_ref[k])
            val[k] *= math.e ** (-(delta ** 2) / (2 * sigma ** 2))
        return val

    scores = []
    for test, refs in zip(ctest, crefs):
        vec, norm, length = counts2vec(test)
        score = [0.0] * n
        for ref in refs:
            vec_ref, norm_ref, length_ref = counts2vec(ref)
            s = sim(vec, vec_ref, norm, norm_ref, length, length_ref)
            for k in range(n):
                score[k] += s[k]
        score_avg = sum(score) / n
        score_avg /= len(refs)
        score_avg *= 10.0
        scores.append(score_avg)
    return sum(scores) / len(scores), scores


# --------------------------------------------------------------------------
# ROUGE_L — transcription of rouge.py (Rouge, beta=1.2)
# --------------------------------------------------------------------------

def _my_lcs(string, sub):
    if len(string) < len(sub):
        sub, string = string, sub
    lengths = [[0 for _ in range(0, len(sub) + 1)] for _ in range(0, len(string) + 1)]
    for j in range(1, len(sub) + 1):
        for i in range(1, len(string) + 1):
            if string[i - 1] == sub[j - 1]:
                lengths[i][j] = lengths[i - 1][j - 1] + 1
            else:
                lengths[i][j] = max(lengths[i - 1][j], lengths[i][j - 1])
    return lengths[len(string)][len(sub)]


def oracle_rouge(references, hypotheses, beta=1.2):
    """Returns (corpus_mean, per_segment_scores)."""
    scores = []
    for refs, hyp in zip(references, hypotheses):
        assert len(refs) > 0
        prec = []
        rec = []
        token_c = hyp.split(" ")  # upstream uses split(" "), not split()
        for reference in refs:
            token_r = reference.split(" ")
            lcs = _my_lcs(token_r, token_c)
            prec.append(lcs / float(len(token_c)))
            rec.append(lcs / float(len(token_r)))
        prec_max = max(prec)
        rec_max = max(rec)
        if prec_max != 0 and rec_max != 0:
            score = ((1 + beta ** 2) * prec_max * rec_max) / float(rec_max + beta ** 2 * prec_max)
        else:
            score = 0.0
        scores.append(score)
    return sum(scores) / len(scores), scores
