"""METEOR — native implementation (exact + Porter-stem matching stages).

The reference's metric stack runs METEOR through nlg-eval's bundled Java jar
(METEOR 1.5); no JVM exists in this image, so this is a from-scratch Python
implementation of the METEOR scoring scheme with the standard parameters
(alpha=0.9, beta=3, gamma=0.5) and the first two matcher stages (exact, stem);
the synonym stage needs WordNet, which is not available offline — documented
deviation: scores correlate with but do not bit-match the jar.

Score per segment = max over references; corpus score = mean over segments
(the jar aggregates corpus-level statistics; the max-over-refs mean is the common
single-process approximation, matching nltk.translate.meteor_score).
"""

from __future__ import annotations

from typing import List, Tuple

from retr_tpu.metrics.porter import porter_stem

ALPHA, BETA, GAMMA = 0.9, 3.0, 0.5


def _align(hyp: List[str], ref: List[str]) -> List[Tuple[int, int]]:
    """Greedy two-stage alignment: exact matches first, then stem matches."""
    matches: List[Tuple[int, int]] = []
    used_h, used_r = set(), set()

    for stage in ("exact", "stem"):
        if stage == "exact":
            h_key, r_key = hyp, ref
        else:
            h_key = [porter_stem(w) for w in hyp]
            r_key = [porter_stem(w) for w in ref]
        for i, hw in enumerate(h_key):
            if i in used_h:
                continue
            for j, rw in enumerate(r_key):
                if j in used_r:
                    continue
                if hw == rw:
                    matches.append((i, j))
                    used_h.add(i)
                    used_r.add(j)
                    break
    return sorted(matches)


def _chunks(matches: List[Tuple[int, int]]) -> int:
    if not matches:
        return 0
    chunks = 1
    for (h0, r0), (h1, r1) in zip(matches, matches[1:]):
        if not (h1 == h0 + 1 and r1 == r0 + 1):
            chunks += 1
    return chunks


def _segment_score(hyp: List[str], ref: List[str]) -> float:
    matches = _align(hyp, ref)
    m = len(matches)
    if m == 0 or not hyp or not ref:
        return 0.0
    precision = m / len(hyp)
    recall = m / len(ref)
    fmean = precision * recall / (ALPHA * precision + (1 - ALPHA) * recall)
    penalty = GAMMA * (_chunks(matches) / m) ** BETA
    return fmean * (1.0 - penalty)


def meteor(references: List[List[str]], hypotheses: List[str]) -> Tuple[float, List[float]]:
    scores = []
    for refs, hyp in zip(references, hypotheses):
        hw = hyp.split()
        scores.append(max((_segment_score(hw, r.split()) for r in refs), default=0.0))
    return sum(scores) / len(scores), scores
