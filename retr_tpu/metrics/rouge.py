"""ROUGE-L F-measure, pycocoevalcap-compatible (beta=1.2, max over references)."""

from __future__ import annotations

from typing import List, Tuple


def _lcs_len(a: List[str], b: List[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def rouge_l(references: List[List[str]], hypotheses: List[str], beta: float = 1.2) -> Tuple[float, List[float]]:
    scores = []
    for refs, hyp in zip(references, hypotheses):
        hw = hyp.split()
        precs, recs = [], []
        for r in refs:
            rw = r.split()
            lcs = _lcs_len(hw, rw)
            precs.append(lcs / len(hw) if hw else 0.0)
            recs.append(lcs / len(rw) if rw else 0.0)
        p, r = max(precs), max(recs)
        if p != 0 and r != 0:
            f = ((1 + beta ** 2) * p * r) / (r + beta ** 2 * p)
        else:
            f = 0.0
        scores.append(f)
    return sum(scores) / len(scores), scores
