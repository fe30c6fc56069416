"""Corpus BLEU-1..4, pycocoevalcap-compatible (the scorer nlgeval wraps).

Matches the algorithm used by the reference's metric stack (engine.py:135-137,184-185
via the Maluuba nlg-eval submodule): corpus-level clipped n-gram precision with the
tiny/small smoothing constants, geometric mean over orders, and brevity penalty from
the per-segment 'closest' reference length (first-wins tie-break, like the scorer).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Sequence, Tuple


def _ngrams(words: Sequence[str], n: int) -> Counter:
    return Counter(tuple(words[i : i + n]) for i in range(len(words) - n + 1))


def _closest_reflen(reflens: List[int], testlen: int) -> int:
    best, best_diff = None, None
    for rl in reflens:
        diff = abs(rl - testlen)
        if best_diff is None or diff < best_diff:
            best, best_diff = rl, diff
    return best


def corpus_bleu(
    references: List[List[str]], hypotheses: List[str], max_n: int = 4
) -> Tuple[List[float], List[List[float]]]:
    """references[i] = list of ref strings for segment i; hypotheses[i] = hyp string.

    Returns ([BLEU-1..max_n corpus scores], per-order per-segment scores are not
    tracked individually — nlgeval reports corpus scores only).
    """
    assert len(references) == len(hypotheses)
    correct = [0] * max_n
    guess = [0] * max_n
    testlen_total = 0
    reflen_total = 0

    for refs, hyp in zip(references, hypotheses):
        hyp_words = hyp.split()
        refs_words = [r.split() for r in refs]
        testlen_total += len(hyp_words)
        reflen_total += _closest_reflen([len(r) for r in refs_words], len(hyp_words))
        for n in range(1, max_n + 1):
            hyp_ng = _ngrams(hyp_words, n)
            max_ref: Dict[tuple, int] = {}
            for rw in refs_words:
                for ng, c in _ngrams(rw, n).items():
                    if c > max_ref.get(ng, 0):
                        max_ref[ng] = c
            correct[n - 1] += sum(min(c, max_ref.get(ng, 0)) for ng, c in hyp_ng.items())
            guess[n - 1] += max(0, len(hyp_words) - n + 1)

    tiny, small = 1e-15, 1e-9
    bleus = []
    score = 1.0
    for n in range(max_n):
        score *= (correct[n] + tiny) / (guess[n] + small)
        bleu_n = score ** (1.0 / (n + 1))
        if testlen_total < reflen_total:  # brevity penalty on corpus totals
            bleu_n *= math.exp(1 - reflen_total / (testlen_total + tiny))
        bleus.append(bleu_n)
    return bleus, []
