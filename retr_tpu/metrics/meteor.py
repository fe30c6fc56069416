"""METEOR — native implementation of the METEOR 1.5 scoring scheme.

The reference's metric stack runs METEOR through nlg-eval's bundled Java jar
(METEOR 1.5, ``java -jar meteor-1.5.jar - - -stdio -l en -norm``; the reference
reports it per epoch/split via engine.py:135-137,184-185). No JVM exists in this
image, so this is a from-scratch Python implementation of the *scheme* that jar
computes for English (Denkowski & Lavie 2014, "Meteor Universal"):

  - parameters alpha=0.85, beta=0.2, gamma=0.6, delta=0.75 (the en defaults);
  - the jar's FOUR matcher modules in stage order: exact (weight 1.0), stem
    (0.6, Snowball English stemmer — nltk's SnowballStemmer('english') when
    available, internal Porter otherwise), synonym (0.8, shared-synset test),
    and paraphrase (0.6, phrase-span table). Synonym and paraphrase are RESOURCE
    modules: they activate when a :class:`MeteorResources` is supplied (directly
    or via the RETR_METEOR_SYNONYMS / RETR_METEOR_PARAPHRASES environment
    variables — the drop-in path for the jar's WordNet synsets and
    paraphrase-en.gz data once those files are available);
  - content/function-word weighting: content words weigh delta, function words
    (1 - delta), for both the match counts and the sentence lengths;
  - one-to-one alignment (phrase-span aware) chosen to maximize matched-word
    coverage, then minimize the number of chunks, then minimize total match
    distance (the jar's beam search objective; beam width 64 here);
  - weighted precision/recall -> fMean = P*R / (alpha*P + (1-alpha)*R);
  - fragmentation penalty gamma * (chunks / ((m_test + m_ref)/2)) ** beta;
  - per segment the best-scoring reference is selected, and the corpus score is
    computed from the SUM of per-segment statistics (the jar's corpus
    aggregation via its EVAL protocol), not the mean of segment scores.

DOCUMENTED DELTAS vs the jar (exact list, per docs/ORACLE.md):
  1. RESOURCE DATA ONLY: the synonym/paraphrase *machinery* is implemented and
     differentially tested against synthetic resources, but the jar's actual
     data files (WordNet-derived synsets; the Meteor paraphrase-en table) are
     not in this image. Without them the resource modules stay inactive and
     scores are a lower bound whenever a hypothesis paraphrases its reference.
     Drop-in: convert WordNet synsets to the one-synset-per-line format and the
     paraphrase table to ``phrase ||| phrase`` lines (see MeteorResources), then
     export RETR_METEOR_SYNONYMS / RETR_METEOR_PARAPHRASES. The same applies to
     the jar's frequency-derived ``function/en.words`` list: the derivation RULE
     is implemented (:func:`function_words_from_corpus`, relative frequency
     > 1e-3) and the file drop-in exists (RETR_METEOR_FUNCTION_WORDS, one word
     per line); without either, a standard closed-class English list is the
     fallback.
  2. The aligner is beam-limited (width 64) with the same objective as the jar's
     search; ties beyond the beam may resolve differently on pathological inputs.
Closed in round 4 (previously deltas 2 and 4): the jar's ``-norm`` input
normalization is now implemented in full (:func:`norm_tokenize` — XML unescape,
unicode punctuation folding, mteval-v13-style punctuation tokenization,
lowercase — the exact pipeline of Meteor 1.5's Normalizer under
``-stdio -l en -norm``), and the function-word list is file/corpus-derivable as
above instead of static-only.
Note the scheme itself gives identical hypothesis/reference a score of
1 - gamma * (S/W) ** beta (S segments, W matched words), not 1.0 — the one-chunk
penalty does not vanish under the 1.5 parameters.
"""

from __future__ import annotations

import os
from typing import Dict, FrozenSet, List, Optional, Sequence, Tuple

ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
# module weights + stage order (earlier stage wins a word pair both propose)
WEIGHT_EXACT, WEIGHT_STEM, WEIGHT_SYNONYM, WEIGHT_PARAPHRASE = 1.0, 0.6, 0.8, 0.6
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


# ---------------------------------------------------------------------------------
# -norm input normalization (Meteor 1.5 Normalizer, jar invocation
# ``-stdio -l en -norm``: tokenize + lowercase; punctuation KEPT — the jar only
# drops it under -noPunct, which nlg-eval does not pass, engine.py:135-137)
# ---------------------------------------------------------------------------------

import re as _re

# XML escapes the jar unescapes first (SGML-heritage input)
_XML_ESCAPES = (("&quot;", '"'), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                ("&apos;", "'"))
# unicode punctuation folded to ASCII before tokenization
_UNICODE_FOLD = {
    "‘": "'", "’": "'", "‚": "'", "‛": "'",
    "“": '"', "”": '"', "„": '"', "‟": '"',
    "‐": "-", "‑": "-", "‒": "-", "–": "-", "—": "-",
    "―": "-", "−": "-",
    "…": "...",
    " ": " ", " ": " ", " ": " ", " ": " ", "　": " ",
}
_UNICODE_FOLD_RE = _re.compile("|".join(map(_re.escape, _UNICODE_FOLD)))
# mteval-v13 international tokenization (what Meteor 1.5's Normalizer applies):
_TOK_PUNCT = _re.compile(r"([\{-\~\[-\` -\&\(-\+\:-\@\/])")  # split punct blocks
_TOK_PERIOD_PRE = _re.compile(r"([^0-9])([\.,])")   # . , unless digit-adjacent
_TOK_PERIOD_POST = _re.compile(r"([\.,])([^0-9])")
_TOK_NUM_DASH = _re.compile(r"([0-9])(-)")
_WS = _re.compile(r"\s+")


def norm_tokenize(text: str) -> List[str]:
    """The jar's ``-norm`` pipeline: XML unescape -> unicode punctuation fold ->
    mteval-v13 punctuation tokenization -> lowercase -> whitespace collapse.

    Engine inputs are already tokenizer-normalized space-separated text
    (engine.py:117-122), for which this is nearly a no-op — but the jar applies
    -norm unconditionally, so scoring arbitrary text (library use, real RefCOCO
    references before tokenizer round-trip) now matches its tokenization."""
    for esc, ch in _XML_ESCAPES:
        if esc in text:
            text = text.replace(esc, ch)
    text = _UNICODE_FOLD_RE.sub(lambda m: _UNICODE_FOLD[m.group(0)], text)
    # mteval-v13a space-wraps before the digit-conditional rules ($norm_text =
    # " $norm_text ") so '.'/','/'-' at a STRING BOUNDARY still sees a non-digit
    # neighbor: 'costs 3.50.' must tokenize to [... '3.50', '.'], not '3.50.'.
    text = f" {text} "
    text = _TOK_PUNCT.sub(r" \1 ", text)
    text = _TOK_PERIOD_PRE.sub(r"\1 \2 ", text)
    text = _TOK_PERIOD_POST.sub(r" \1 \2", text)
    text = _TOK_NUM_DASH.sub(r"\1 - ", text)
    return _WS.sub(" ", text).strip().lower().split()


# ---------------------------------------------------------------------------------
# Function-word list resolution (the jar's function/en.words)
# ---------------------------------------------------------------------------------


def load_function_words(path: str) -> FrozenSet[str]:
    """Load a jar-format function-word list: one word per line ('#' comments and
    blank lines skipped) — the drop-in for Meteor's bundled ``function/en.words``
    via RETR_METEOR_FUNCTION_WORDS."""
    words = set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            w = line.strip().lower()
            if w and not w.startswith("#"):
                words.add(w)
    return frozenset(words)


def function_words_from_corpus(sentences, threshold: float = 1e-3) -> FrozenSet[str]:
    """Derive a function-word list by the jar's rule: words whose RELATIVE
    FREQUENCY in a (large, monolingual) corpus exceeds ``threshold`` (1e-3 — how
    Meteor 1.5 built its bundled function/<lang>.words lists).

    Feed it the corpus the jar would have seen — e.g. all RefCOCO training
    captions — and pass the result as ``meteor(..., function_words=...)``."""
    from collections import Counter

    counts: Counter = Counter()
    total = 0
    for s in sentences:
        toks = norm_tokenize(s) if isinstance(s, str) else [t.lower() for t in s]
        counts.update(toks)
        total += len(toks)
    if total == 0:
        return frozenset()
    return frozenset(w for w, c in counts.items() if c / total > threshold)


@lru_cache(maxsize=4)
def _load_function_words_cached(path: str) -> FrozenSet[str]:
    return load_function_words(path)


def resolve_function_words() -> FrozenSet[str]:
    """Active function-word list: RETR_METEOR_FUNCTION_WORDS file if set (the
    jar's en.words drop-in), else the embedded closed-class fallback."""
    path = os.environ.get("RETR_METEOR_FUNCTION_WORDS")
    if path:
        return _load_function_words_cached(path)
    return FUNCTION_WORDS


class MeteorResources:
    """Pluggable data for the jar's two resource matcher modules.

    ``synonyms``: word -> frozenset of synset ids. Two distinct words
    synonym-match (weight 0.8) when their synset sets intersect — the jar's
    WordNet shared-synset test. File format (``from_files``/``from_env``): one
    synset per line, its member words space-separated (convert WordNet's
    ``data.*`` or the jar's bundled synsets to this).

    ``paraphrases``: phrase tuple -> frozenset of phrase tuples (symmetric
    closure applied at load). A hyp span paraphrase-matches a ref span (weight
    0.6) when the table relates them — the jar's paraphrase-en table. File
    format: one pair per line, ``phrase one ||| phrase two`` (TAB also accepted).
    """

    def __init__(self, synonyms: Optional[Dict[str, FrozenSet]] = None,
                 paraphrases: Optional[Dict[Tuple[str, ...], FrozenSet]] = None):
        self.synonyms = synonyms or {}
        self.paraphrases = paraphrases or {}
        self.max_phrase_len = max((len(p) for p in self.paraphrases), default=1)

    def __bool__(self) -> bool:
        return bool(self.synonyms) or bool(self.paraphrases)

    def synonym_match(self, a: str, b: str) -> bool:
        if a == b:
            return False  # exact stage already owns the pair
        sa = self.synonyms.get(a)
        return bool(sa) and not sa.isdisjoint(self.synonyms.get(b, frozenset()))

    def paraphrase_targets(self, phrase: Tuple[str, ...]) -> FrozenSet:
        return self.paraphrases.get(phrase, frozenset())

    @classmethod
    def from_files(cls, synonym_path: Optional[str] = None,
                   paraphrase_path: Optional[str] = None) -> "MeteorResources":
        synonyms: Dict[str, set] = {}
        if synonym_path:
            with open(synonym_path, encoding="utf-8") as f:
                for sid, line in enumerate(f):
                    words = line.lower().split()
                    for w in words:
                        synonyms.setdefault(w, set()).add(sid)
        paraphrases: Dict[Tuple[str, ...], set] = {}
        if paraphrase_path:
            with open(paraphrase_path, encoding="utf-8") as f:
                for line in f:
                    parts = (line.lower().split("|||") if "|||" in line
                             else line.lower().split("\t"))
                    if len(parts) != 2:
                        continue
                    a, b = tuple(parts[0].split()), tuple(parts[1].split())
                    if not a or not b or a == b:
                        continue
                    paraphrases.setdefault(a, set()).add(b)
                    paraphrases.setdefault(b, set()).add(a)
        return cls({w: frozenset(s) for w, s in synonyms.items()},
                   {p: frozenset(s) for p, s in paraphrases.items()})

    @classmethod
    def from_env(cls) -> Optional["MeteorResources"]:
        """Resources named by RETR_METEOR_SYNONYMS / RETR_METEOR_PARAPHRASES, or
        None when neither is set — the zero-config drop-in path."""
        syn = os.environ.get("RETR_METEOR_SYNONYMS") or None
        par = os.environ.get("RETR_METEOR_PARAPHRASES") or None
        if not syn and not par:
            return None
        return _load_resources_cached(syn, par)


@lru_cache(maxsize=8)
def _load_resources_cached(syn, par):
    return MeteorResources.from_files(syn, par)


# A span match: (hyp_start, hyp_len, ref_start, ref_len, module_weight)
Match = Tuple[int, int, int, int, float]


def _candidate_matches(
    hyp: List[str], ref: List[str], resources: Optional[MeteorResources]
) -> List[List[Tuple[int, int, int, float]]]:
    """Per hyp start index: candidate (hyp_len, ref_start, ref_len, weight) spans.

    Modules run in the jar's stage order — exact, stem, synonym, paraphrase —
    and an earlier stage owns a (hyp span, ref span) pair both propose, so e.g.
    a stem match is never downgraded to a paraphrase match.
    """
    hyp_stems = [_stem(w) for w in hyp]
    ref_stems = [_stem(w) for w in ref]
    cands: List[List[Tuple[int, int, int, float]]] = [[] for _ in hyp]
    claimed = set()  # (hyp_start, hyp_len, ref_start, ref_len) pairs already owned

    def add(i, hl, j, rl, w):
        key = (i, hl, j, rl)
        if key not in claimed:
            claimed.add(key)
            cands[i].append((hl, j, rl, w))

    for i, hw in enumerate(hyp):  # stage 0: exact
        for j, rw in enumerate(ref):
            if hw == rw:
                add(i, 1, j, 1, WEIGHT_EXACT)
    for i in range(len(hyp)):  # stage 1: stem
        for j in range(len(ref)):
            if hyp_stems[i] == ref_stems[j]:
                add(i, 1, j, 1, WEIGHT_STEM)
    if resources:
        for i, hw in enumerate(hyp):  # stage 2: synonym (WordNet shared synset)
            for j, rw in enumerate(ref):
                if resources.synonym_match(hw, rw):
                    add(i, 1, j, 1, WEIGHT_SYNONYM)
        if resources.paraphrases:  # stage 3: paraphrase (phrase spans)
            mpl = resources.max_phrase_len
            ref_spans: Dict[Tuple[str, ...], List[int]] = {}
            for j in range(len(ref)):
                for rl in range(1, min(mpl, len(ref) - j) + 1):
                    ref_spans.setdefault(tuple(ref[j:j + rl]), []).append(j)
            for i in range(len(hyp)):
                for hl in range(1, min(mpl, len(hyp) - i) + 1):
                    for target in resources.paraphrase_targets(tuple(hyp[i:i + hl])):
                        for j in ref_spans.get(target, ()):
                            add(i, hl, j, len(target), WEIGHT_PARAPHRASE)
    return cands


def _align(hyp: List[str], ref: List[str],
           resources: Optional[MeteorResources] = None) -> List[Match]:
    """One-to-one span alignment as (hyp_start, hyp_len, ref_start, ref_len, w).

    Beam search over hyp positions; objective (jar's PartialAlignment order):
    maximize matched-word coverage, then minimize chunks, then minimize total
    start distance. Single-word-only inputs reduce to the classic word aligner.
    """
    cands = _candidate_matches(hyp, ref, resources)
    if not any(cands):
        return []

    # state: (covered_words, chunks, dist, used_ref frozenset,
    #         last (hyp_end, ref_end) or None, next free hyp index, picked)
    states = [(0, 0, 0, frozenset(), None, 0, ())]
    for i in range(len(hyp)):
        nxt = []
        for st in states:
            m, ch, d, used, last, free, picked = st
            if free > i:  # a span already covers hyp[i]
                nxt.append(st)
                continue
            # option: leave hyp[i] unmatched
            nxt.append((m, ch, d, used, last, i + 1, picked))
            for hl, j, rl, w in cands[i]:
                span = range(j, j + rl)
                if any(r in used for r in span):
                    continue
                contiguous = last is not None and last == (i, j)
                nxt.append(
                    (
                        m + hl + rl,
                        ch + (0 if contiguous else 1),
                        d + abs(i - j),
                        used | set(span),
                        (i + hl, j + rl),
                        i + hl,
                        picked + ((i, hl, j, rl, w),),
                    )
                )
        # prune: best (max coverage, min chunks, min dist); dedupe identical keys
        nxt.sort(key=lambda s: (-s[0], s[1], s[2]))
        seen = set()
        states = []
        for s in nxt:
            key = (s[0], s[1], s[3], s[4], s[5])
            if key in seen:
                continue
            seen.add(key)
            states.append(s)
            if len(states) >= BEAM:
                break
    best = min(states, key=lambda s: (-s[0], s[1], s[2]))
    return list(best[6])


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


def _segment_stats(hyp: List[str], ref: List[str],
                   resources: Optional[MeteorResources] = None,
                   function_words: FrozenSet[str] = FUNCTION_WORDS) -> MeteorStats:
    st = MeteorStats()
    _is_function = function_words.__contains__
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
    matches = _align(hyp, ref, resources)
    for (i, hl, j, rl, w) in matches:
        st.test_total_matches += hl
        st.ref_total_matches += rl
        for k in range(i, i + hl):
            st.w_test_matches += w * ((1 - DELTA) if _is_function(hyp[k]) else DELTA)
        for k in range(j, j + rl):
            st.w_ref_matches += w * ((1 - DELTA) if _is_function(ref[k]) else DELTA)
    # chunks: span contiguity in both strings, over matches sorted by hyp position
    ms = sorted((i, hl, j, rl) for (i, hl, j, rl, _) in matches)
    if ms:
        st.chunks = 1
        for (h0, hl0, r0, rl0), (h1, _, r1, _) in zip(ms, ms[1:]):
            if not (h1 == h0 + hl0 and r1 == r0 + rl0):
                st.chunks += 1
    return st


def meteor_stats(
    references: Sequence[Sequence[str]], hypotheses: Sequence[str],
    resources: Optional[MeteorResources] = None,
    function_words: Optional[FrozenSet[str]] = None,
) -> Tuple[MeteorStats, List[float]]:
    """Aggregate corpus stats (best reference per segment) + per-segment scores."""
    if function_words is None:
        function_words = resolve_function_words()
    corpus = MeteorStats()
    seg_scores: List[float] = []
    for refs, hyp in zip(references, hypotheses):
        hw = norm_tokenize(hyp)
        best: Optional[MeteorStats] = None
        best_score = -1.0
        for r in refs:
            st = _segment_stats(hw, norm_tokenize(r), resources, function_words)
            s = st.score()
            if s > best_score:
                best, best_score = st, s
        if best is None:  # no references — keep empty stats
            best, best_score = MeteorStats(), 0.0
        corpus.add(best)
        seg_scores.append(best_score)
    return corpus, seg_scores


def meteor(references: List[List[str]], hypotheses: List[str],
           resources: Optional[MeteorResources] = None,
           function_words: Optional[FrozenSet[str]] = None) -> Tuple[float, List[float]]:
    """Corpus METEOR (jar-style aggregate-stats score) + per-segment scores.

    ``resources=None`` falls back to :meth:`MeteorResources.from_env` — set
    RETR_METEOR_SYNONYMS / RETR_METEOR_PARAPHRASES to activate the synonym and
    paraphrase modules without code changes. ``function_words=None`` resolves
    via RETR_METEOR_FUNCTION_WORDS (jar en.words drop-in) or the embedded
    closed-class fallback; pass :func:`function_words_from_corpus`'s output to
    use the jar's frequency-derivation rule on your own corpus.
    """
    if resources is None:
        resources = MeteorResources.from_env()
    corpus, seg_scores = meteor_stats(references, hypotheses, resources,
                                      function_words)
    return corpus.score(), seg_scores
