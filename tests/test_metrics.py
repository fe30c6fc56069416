"""Metric tests: golden values, identity properties, nlgeval-facade shapes."""

import math

import pytest

from retr_tpu.metrics import NLGEval, compute_metrics
from retr_tpu.metrics.bleu import corpus_bleu
from retr_tpu.metrics.cider import cider
from retr_tpu.metrics.meteor import meteor
from retr_tpu.metrics.porter import porter_stem
from retr_tpu.metrics.rouge import rouge_l


def test_bleu_perfect_match():
    refs = [["the cat sat on the mat"], ["a dog runs fast"]]
    hyps = ["the cat sat on the mat", "a dog runs fast"]
    bleus, _ = corpus_bleu(refs, hyps)
    for b in bleus:
        assert b == pytest.approx(1.0, abs=1e-6)


def test_bleu_unigram_golden():
    # hyp 'the the cat' vs ref 'the cat': clipped unigram correct = min(2,1)+1 = 2,
    # guess = 3; BP = exp(1 - 2/3)... testlen 3 > reflen 2 -> no BP. BLEU1 = 2/3.
    bleus, _ = corpus_bleu([["the cat"]], ["the the cat"])
    assert bleus[0] == pytest.approx(2.0 / 3.0, abs=1e-6)


def test_bleu_brevity_penalty():
    # hyp shorter than ref: BP = exp(1 - reflen/testlen)
    bleus, _ = corpus_bleu([["the cat sat on the mat"]], ["the cat"])
    expected = 1.0 * math.exp(1 - 6 / 2)
    assert bleus[0] == pytest.approx(expected, rel=1e-5)


def test_cider_identical_corpus():
    refs = [["the red dog", "a red dog"], ["a small cat", "the small cat"]]
    hyps = ["the red dog", "a small cat"]
    score, per = cider(refs, hyps)
    assert score > 0
    assert len(per) == 2
    # hypothesis identical to one reference scores higher than a disjoint one
    score2, _ = cider(refs, ["green banana here", "purple elephant there"])
    assert score > score2


def test_cider_length_penalty_applies():
    # varied refs across images so idf is non-degenerate
    refs = [["the red dog on the mat"], ["a small cat under the chair"]]
    s_exact, _ = cider(refs, ["the red dog on the mat", "a small cat under the chair"])
    s_short, _ = cider(refs, ["the red dog", "a small cat"])
    assert s_exact > s_short > 0


def test_rouge_golden():
    # hyp 'the cat' vs ref 'the cat sat': lcs=2, p=1.0, r=2/3, beta=1.2
    score, per = rouge_l([["the cat sat"]], ["the cat"])
    p, r, b = 1.0, 2 / 3, 1.2
    expected = (1 + b * b) * p * r / (r + b * b * p)
    assert score == pytest.approx(expected, rel=1e-6)


def test_rouge_max_over_refs():
    score, _ = rouge_l([["completely different words", "the cat sat"]], ["the cat sat"])
    assert score == pytest.approx(1.0)


def test_porter_stemmer_classics():
    for w, s in [("caresses", "caress"), ("ponies", "poni"), ("cats", "cat"),
                 ("agreed", "agre"), ("plastered", "plaster"), ("motoring", "motor"),
                 ("happy", "happi"), ("relational", "relat"), ("adjustable", "adjust"),
                 ("effective", "effect")]:
        assert porter_stem(w) == s, (w, porter_stem(w), s)


def test_meteor_exact_and_stem():
    # METEOR 1.5 scheme: perfect match, m=3, one chunk: fmean=1,
    # penalty = gamma*(1/3)**beta (does not vanish at identity under 1.5 params)
    score, _ = meteor([["the cat sat"]], ["the cat sat"])
    assert score == pytest.approx(1.0 - 0.6 * (1 / 3) ** 0.2, abs=1e-9)
    # stem-stage match: 'running' vs 'runs' -> both stem to 'run' (weight 0.6)
    s2, _ = meteor([["the dog runs"]], ["the dog running"])
    assert 0.0 < s2 < score
    s3, _ = meteor([["entirely different sentence"]], ["the dog running"])
    assert s3 == 0.0


def test_meteor_synonym_module():
    """Synonym matcher (WordNet-style shared synset, weight 0.8) against a
    hand-built resource; expected score derived by hand from the 1.5 scheme."""
    from retr_tpu.metrics.meteor import MeteorResources

    res = MeteorResources(synonyms={"cat": frozenset({1}), "feline": frozenset({1})})
    base, _ = meteor([["the cat sat"]], ["the feline sat"])
    got, _ = meteor([["the cat sat"]], ["the feline sat"], resources=res)
    # hand derivation: matches the(1.0,func) + feline~cat(0.8,content) + sat(1.0,
    # content); weighted m = .25 + .8*.75 + .75 = 1.6 over weighted len 1.75 on
    # both sides -> P=R=fmean; 1 chunk over avg 3 matches
    fmean = (1.6 / 1.75)
    expected = fmean * (1.0 - 0.6 * (1 / 3) ** 0.2)
    assert got == pytest.approx(expected, abs=1e-12)
    assert base < got  # without the resource 'feline' goes unmatched
    perfect, _ = meteor([["the cat sat"]], ["the cat sat"], resources=res)
    assert got < perfect  # synonym weight 0.8 < exact 1.0


def test_meteor_stage_priority_stem_owns_pair():
    """Jar stage order: a pair matched by the stem stage is NOT re-matched by the
    higher-weight synonym stage (exact > stem > synonym > paraphrase)."""
    from retr_tpu.metrics.meteor import MeteorResources

    res = MeteorResources(
        synonyms={"running": frozenset({7}), "runs": frozenset({7})})
    without, _ = meteor([["the dog runs"]], ["the dog running"])
    with_syn, _ = meteor([["the dog runs"]], ["the dog running"], resources=res)
    assert with_syn == pytest.approx(without, abs=1e-12)


def test_meteor_paraphrase_module_spans():
    """Paraphrase matcher (weight 0.6) aligns a 1-word hyp span to a 2-word ref
    span; expected score derived by hand (word-coverage counts, span chunks)."""
    from retr_tpu.metrics.meteor import MeteorResources

    res = MeteorResources(paraphrases={
        ("surrendered",): frozenset({("gave", "up")}),
        ("gave", "up"): frozenset({("surrendered",)}),
    })

    refs, hyp = [["he gave up the fight"]], ["he surrendered the fight"]
    base, _ = meteor(refs, hyp)
    got, _ = meteor(refs, hyp, resources=res)
    assert base < got
    # hand derivation (delta=.75): hyp he(f) surrendered(c) the(f) fight(c) ->
    # wlen 2.0; ref he(f) gave(c) up(f) the(f) fight(c) -> wlen 2.25.
    # matches: he 1.0f, surrendered<->(gave up) 0.6 covering c+f on ref side,
    # the 1.0f, fight 1.0c; all contiguous -> 1 chunk over avg (4+5)/2 words.
    p = (0.25 + 0.6 * 0.75 + 0.25 + 0.75) / 2.0
    r = (0.25 + 0.6 * 0.75 + 0.6 * 0.25 + 0.25 + 0.75) / 2.25
    fmean = p * r / (0.85 * p + 0.15 * r)
    expected = fmean * (1.0 - 0.6 * (1 / 4.5) ** 0.2)
    assert got == pytest.approx(expected, abs=1e-12)


def test_meteor_resources_from_files_and_env(tmp_path, monkeypatch):
    """File loaders + the RETR_METEOR_* env drop-in path reach NLGEval."""
    from retr_tpu.metrics.meteor import MeteorResources

    syn = tmp_path / "synsets.txt"
    syn.write_text("cat feline\ndog canine hound\n")
    par = tmp_path / "paraphrases.txt"
    par.write_text("gave up ||| surrendered\nmalformed line without sep\n")

    res = MeteorResources.from_files(str(syn), str(par))
    assert res.synonym_match("cat", "feline")
    assert res.synonym_match("hound", "canine")
    assert not res.synonym_match("cat", "dog")
    assert not res.synonym_match("cat", "cat")  # exact stage owns identity
    assert ("surrendered",) in res.paraphrase_targets(("gave", "up"))
    assert ("gave", "up") in res.paraphrase_targets(("surrendered",))  # symmetric
    assert res.max_phrase_len == 2

    plain = NLGEval().compute_metrics([["the feline sat"]], ["the cat sat"])
    monkeypatch.setenv("RETR_METEOR_SYNONYMS", str(syn))
    monkeypatch.setenv("RETR_METEOR_PARAPHRASES", str(par))
    enriched = NLGEval().compute_metrics([["the feline sat"]], ["the cat sat"])
    assert enriched["METEOR"] > plain["METEOR"]
    assert enriched["Bleu_1"] == plain["Bleu_1"]  # only METEOR consumes resources


def test_nlgeval_facade_transposed_refs():
    # reference calls with zip(*)-transposed refs (engine.py:181): ref_list[k][i]
    refs_per_seg = [["the red dog", "a red dog"], ["a small cat", "one small cat"]]
    transposed = list(map(list, zip(*refs_per_seg)))
    hyps = ["the red dog", "a small cat"]
    m = NLGEval(no_skipthoughts=True, no_glove=True).compute_metrics(transposed, hyps)
    assert set(m) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"}
    assert m["Bleu_1"] == pytest.approx(1.0, abs=1e-6)
    assert m["CIDEr"] > 1.0


def test_metrics_to_omit():
    # transposed layout: one reference per segment, two segments
    m = compute_metrics([["a b", "a b"]], ["a b", "a b"], metrics_to_omit=["METEOR", "CIDEr"])
    assert "METEOR" not in m and "CIDEr" not in m and "Bleu_4" in m


def test_meteor_norm_tokenize_matches_jar_pipeline():
    """-norm: XML unescape, unicode fold, mteval-v13 punct splits, lowercase
    (Meteor 1.5 Normalizer under -stdio -l en -norm; delta 4 closed r4)."""
    from retr_tpu.metrics.meteor import norm_tokenize

    # punctuation separated from words; case folded. NOTE the apostrophe stays
    # ATTACHED — mteval-v13's ranges ( -&, (-+, :-@, ...) exclude char 39, so the
    # jar keeps "woman's" as one token.
    assert norm_tokenize("The woman's red coat.") == \
        ["the", "woman's", "red", "coat", "."]
    # . and , NOT split inside numbers (mteval digit rule), but split at word edges
    assert norm_tokenize("It costs 3.50, right?") == \
        ["it", "costs", "3.50", ",", "right", "?"]
    # dash after digit splits; unicode quotes/dashes folded to ASCII first
    assert norm_tokenize("a 5-way tie — “wow”") == \
        ["a", "5", "-", "way", "tie", "-", '"', "wow", '"']
    # XML escapes unescaped before tokenization
    assert norm_tokenize("fish &amp; chips") == ["fish", "&", "chips"]
    # already-normalized engine text (space-separated lowercase) is a no-op
    assert norm_tokenize("the cat sat") == ["the", "cat", "sat"]
    # mteval-v13a space-wraps BEFORE the digit-conditional rules, so '.'/','
    # adjacent to a digit at a STRING BOUNDARY still splits (the interior
    # digit context '3.50' does not):
    assert norm_tokenize("it costs 3.50.") == ["it", "costs", "3.50", "."]
    assert norm_tokenize(".5 or 5,") == [".", "5", "or", "5", ","]


def test_meteor_norm_tokenization_affects_scoring():
    """Pre-r4 lowercase-split treated 'coat.' as one unmatched token; the jar's
    tokenizer splits the period so the word itself matches."""
    from retr_tpu.metrics.meteor import meteor

    s_punct, _ = meteor([["the red coat."]], ["the red coat"])
    s_plain, _ = meteor([["the red coat"]], ["the red coat"])
    assert s_punct > 0.4  # 'coat' matches despite the trailing period
    # and the tokenized period only costs a ref-recall word, not the whole token
    assert s_punct == pytest.approx(s_plain, abs=0.2)


def test_meteor_function_words_from_corpus_rule():
    """The jar's derivation rule: relative frequency > 1e-3 over a corpus."""
    from retr_tpu.metrics.meteor import function_words_from_corpus

    corpus = ["the cat sat on the mat"] * 1000 + ["zyzzyva"]
    fw = function_words_from_corpus(corpus, threshold=1e-3)
    assert "the" in fw and "cat" in fw  # everything frequent qualifies
    assert "zyzzyva" not in fw          # 1/6001 < 1e-3
    # tighten: with threshold high enough only 'the' (2x per sentence) survives
    fw2 = function_words_from_corpus(corpus, threshold=0.25)
    assert fw2 == frozenset({"the"})
    assert function_words_from_corpus([]) == frozenset()


def test_meteor_function_words_env_dropin(tmp_path, monkeypatch):
    """RETR_METEOR_FUNCTION_WORDS: jar en.words drop-in changes the weighting."""
    from retr_tpu.metrics.meteor import meteor, resolve_function_words, FUNCTION_WORDS

    assert resolve_function_words() is FUNCTION_WORDS
    fwfile = tmp_path / "en.words"
    fwfile.write_text("# comment\nred\ncat\n\n")
    monkeypatch.setenv("RETR_METEOR_FUNCTION_WORDS", str(fwfile))
    fw = resolve_function_words()
    assert fw == frozenset({"red", "cat"})

    # partial match where the MATCHED word flips content<->function between lists:
    # with 'red' a function word (weight 1-delta=0.25) the miss on 'dog/cat'
    # (content) hurts more than under the default list.
    s_custom, _ = meteor([["red cat"]], ["red dog"])
    monkeypatch.delenv("RETR_METEOR_FUNCTION_WORDS")
    s_default, _ = meteor([["red cat"]], ["red dog"])
    assert s_custom != s_default
