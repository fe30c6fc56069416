"""METEOR — native implementation of the METEOR 1.5 scoring scheme.

The reference's metric stack runs METEOR through nlg-eval's bundled Java jar
(METEOR 1.5, ``java -jar meteor-1.5.jar - - -stdio -l en -norm``; the reference
reports it per epoch/split via engine.py:135-137,184-185). No JVM exists in this
image, so this is a from-scratch Python implementation of the *scheme* that jar
computes for English (Denkowski & Lavie 2014, "Meteor Universal"):

  - parameters alpha=0.85, beta=0.2, gamma=0.6, delta=0.75 (the en defaults);
  - matcher modules exact (weight 1.0) and stem (weight 0.6) with the Snowball
    English stemmer (the same stemmer family the jar uses; nltk's
    SnowballStemmer('english') when available, internal Porter otherwise);
  - content/function-word weighting: content words weigh delta, function words
    (1 - delta), for both the match counts and the sentence lengths;
  - one-to-one alignment chosen to maximize matched-word coverage, then minimize
    the number of chunks, then minimize total match distance (the jar's beam
    search objective; beam width 64 here);
  - weighted precision/recall -> fMean = P*R / (alpha*P + (1-alpha)*R);
  - fragmentation penalty gamma * (chunks / ((m_test + m_ref)/2)) ** beta;
  - per segment the best-scoring reference is selected, and the corpus score is
    computed from the SUM of per-segment statistics (the jar's corpus
    aggregation via its EVAL protocol), not the mean of segment scores.

DOCUMENTED DELTAS vs the jar (exact list, per docs/ORACLE.md):
  1. No synonym (WordNet, weight 0.8) or paraphrase (table, weight 0.6) modules —
     neither resource exists offline in this image. Scores are therefore a lower
     bound whenever a hypothesis paraphrases its reference.
  2. The function-word list is a standard closed-class English list embedded
     below; the jar derives its list from corpus relative frequency (>1e-3).
  3. The aligner is beam-limited (width 64) with the same objective as the jar's
     search; ties beyond the beam may resolve differently on pathological inputs.
  4. The jar's -norm tokenization is reduced to lowercasing: engine inputs are
     already tokenizer-normalized, space-separated text (engine.py:117-122).
Note the scheme itself gives identical hypothesis/reference a score of
1 - gamma * (S/W) ** beta (S segments, W matched words), not 1.0 — the one-chunk
penalty does not vanish under the 1.5 parameters.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
WEIGHT_EXACT, WEIGHT_STEM = 1.0, 0.6
BEAM = 64

from functools import lru_cache

try:  # Snowball (Porter2) — what METEOR 1.5 uses for English
    from nltk.stem.snowball import SnowballStemmer

    _SNOWBALL = SnowballStemmer("english")

    @lru_cache(maxsize=65536)  # corpora reuse a small vocabulary; stemming was 80% of METEOR time
    def _stem(w: str) -> str:
        return _SNOWBALL.stem(w)

except Exception:  # pragma: no cover - nltk is baked into this image
    from retr_tpu.metrics.porter import porter_stem as _porter_stem

    _stem = lru_cache(maxsize=65536)(_porter_stem)

# Standard closed-class English function words (approximation of the jar's
# frequency-derived function/en.words list — delta #2 above).
FUNCTION_WORDS = frozenset(
    """a an the this that these those some any each every no all both either neither
    i you he she it we they me him her us them my your his its our their mine yours
    hers ours theirs myself yourself himself herself itself ourselves yourselves
    themselves who whom whose which what where when why how
    is am are was were be been being do does did done have has had having
    will would shall should can could may might must ought
    and or but nor so yet if then than as because while although though unless
    until since whether once
    of in on at by for with about against between into through during before after
    above below to from up down out off over under again further here there
    not only just also very too quite rather almost
    's 'll 're 've 'd 'm n't . , ! ? ; : ' " ( ) [ ] -""".split()
)


def _candidate_matches(hyp: List[str], ref: List[str]) -> List[List[Tuple[int, float]]]:
    """For each hyp index, the list of (ref_index, module_weight) candidates.

    Exact matches take priority over stem matches for the same (i, j) pair
    (the jar keeps the highest-weight module per pair).
    """
    hyp_stems = [_stem(w) for w in hyp]
    ref_stems = [_stem(w) for w in ref]
    cands: List[List[Tuple[int, float]]] = []
    for i, hw in enumerate(hyp):
        row: List[Tuple[int, float]] = []
        for j, rw in enumerate(ref):
            if hw == rw:
                row.append((j, WEIGHT_EXACT))
            elif hyp_stems[i] == ref_stems[j]:
                row.append((j, WEIGHT_STEM))
        cands.append(row)
    return cands


def _align(hyp: List[str], ref: List[str]) -> List[Tuple[int, int, float]]:
    """One-to-one alignment as (hyp_idx, ref_idx, module_weight) tuples.

    Beam search over hyp positions; objective (jar's PartialAlignment order):
    maximize match count, then minimize chunks, then minimize sum |i - j|.
    """
    cands = _candidate_matches(hyp, ref)
    if not any(cands):
        return []

    # state: (matches, chunks, dist, used_ref frozenset, last (i,j) or None, picked)
    states = [(0, 0, 0, frozenset(), None, ())]
    for i, row in enumerate(cands):
        nxt = []
        for m, ch, d, used, last, picked in states:
            # option: leave hyp[i] unmatched
            nxt.append((m, ch, d, used, last, picked))
            for j, w in row:
                if j in used:
                    continue
                contiguous = last is not None and last[0] == i - 1 and last[1] == j - 1
                nxt.append(
                    (
                        m + 1,
                        ch + (0 if contiguous else 1),
                        d + abs(i - j),
                        used | {j},
                        (i, j),
                        picked + ((i, j, w),),
                    )
                )
        # prune: best (max matches, min chunks, min dist); dedupe identical keys
        nxt.sort(key=lambda s: (-s[0], s[1], s[2]))
        seen = set()
        states = []
        for s in nxt:
            key = (s[0], s[1], s[3], s[4])
            if key in seen:
                continue
            seen.add(key)
            states.append(s)
            if len(states) >= BEAM:
                break
    best = min(states, key=lambda s: (-s[0], s[1], s[2]))
    return list(best[5])


class MeteorStats:
    """Per-segment (and summable corpus) sufficient statistics, MeteorStats-style."""

    __slots__ = (
        "test_len_content", "test_len_function",
        "ref_len_content", "ref_len_function",
        "w_test_matches", "w_ref_matches",
        "test_total_matches", "ref_total_matches", "chunks",
    )

    def __init__(self):
        self.test_len_content = 0
        self.test_len_function = 0
        self.ref_len_content = 0
        self.ref_len_function = 0
        self.w_test_matches = 0.0
        self.w_ref_matches = 0.0
        self.test_total_matches = 0
        self.ref_total_matches = 0
        self.chunks = 0

    def add(self, other: "MeteorStats") -> None:
        for f in self.__slots__:
            setattr(self, f, getattr(self, f) + getattr(other, f))

    def score(self) -> float:
        w_test_len = DELTA * self.test_len_content + (1 - DELTA) * self.test_len_function
        w_ref_len = DELTA * self.ref_len_content + (1 - DELTA) * self.ref_len_function
        p = self.w_test_matches / w_test_len if w_test_len > 0 else 0.0
        r = self.w_ref_matches / w_ref_len if w_ref_len > 0 else 0.0
        if p == 0.0 or r == 0.0:
            return 0.0
        fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
        pen = 0.0
        avg_matches = (self.test_total_matches + self.ref_total_matches) / 2.0
        if self.chunks > 0 and avg_matches > 0:
            pen = GAMMA * (self.chunks / avg_matches) ** BETA
        return fmean * (1.0 - pen)


def _is_function(word: str) -> bool:
    return word in FUNCTION_WORDS


def _segment_stats(hyp: List[str], ref: List[str]) -> MeteorStats:
    st = MeteorStats()
    for w in hyp:
        if _is_function(w):
            st.test_len_function += 1
        else:
            st.test_len_content += 1
    for w in ref:
        if _is_function(w):
            st.ref_len_function += 1
        else:
            st.ref_len_content += 1
    matches = _align(hyp, ref)
    st.test_total_matches = len(matches)
    st.ref_total_matches = len(matches)
    for (i, j, w) in matches:
        st.w_test_matches += w * ((1 - DELTA) if _is_function(hyp[i]) else DELTA)
        st.w_ref_matches += w * ((1 - DELTA) if _is_function(ref[j]) else DELTA)
    # chunks: contiguity in both strings, over matches sorted by hyp position
    ms = sorted((i, j) for (i, j, _) in matches)
    if ms:
        st.chunks = 1
        for (h0, r0), (h1, r1) in zip(ms, ms[1:]):
            if not (h1 == h0 + 1 and r1 == r0 + 1):
                st.chunks += 1
    return st


def meteor_stats(
    references: Sequence[Sequence[str]], hypotheses: Sequence[str]
) -> Tuple[MeteorStats, List[float]]:
    """Aggregate corpus stats (best reference per segment) + per-segment scores."""
    corpus = MeteorStats()
    seg_scores: List[float] = []
    for refs, hyp in zip(references, hypotheses):
        hw = hyp.lower().split()
        best: Optional[MeteorStats] = None
        best_score = -1.0
        for r in refs:
            st = _segment_stats(hw, r.lower().split())
            s = st.score()
            if s > best_score:
                best, best_score = st, s
        if best is None:  # no references — keep empty stats
            best, best_score = MeteorStats(), 0.0
        corpus.add(best)
        seg_scores.append(best_score)
    return corpus, seg_scores


def meteor(references: List[List[str]], hypotheses: List[str]) -> Tuple[float, List[float]]:
    """Corpus METEOR (jar-style aggregate-stats score) + per-segment scores."""
    corpus, seg_scores = meteor_stats(references, hypotheses)
    return corpus.score(), seg_scores
