"""Text-analysis expressions for the training-data pipeline.

All pure Spark Column expressions (JVM-side): token counting, quality
scoring, n-gram shingling, language ID, rolling-hash fingerprints.
The reference's analogues are per-row Python string utilities
(``app/util/text_deal.py``); here they vectorize for 100 TB corpora.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword language
# heuristic. Deliberately small + disjoint so the rule is deterministic and
# SQL-expressible for the DuckDB oracle.
LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " ist ", " nicht "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " los ", " es ", " una ", " que "],
}

STOPWORDS_EN = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "as", "with", "was", "at", "by", "an", "be", "this", "are",
]


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank strings count 0."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def word_tokens(text: Column) -> Column:
    """Lower-cased word tokens (BPE-ish regex: letters/digits runs)."""
    return F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"), lambda x: x != ""
    )


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Character n-gram shingles as array<string> (for minhash / jaccard).

    Uses ``sequence`` + ``transform`` + ``substring`` — no UDF. Texts shorter
    than ``n`` yield a single shingle (the whole text).
    """
    t = F.lower(text)
    length = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(length - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, n)))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    total = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters."""
    total = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    return F.when(total > 0, alpha / total).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    """Fraction of word tokens that are English stopwords."""
    toks = word_tokens(text)
    n = F.size(toks)
    stops = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS_EN)))
    return F.when(n > 0, stops / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: length + alpha + stopword signals.

    Mirrors C4/Gopher-style heuristics: very short docs, punctuation soup,
    and stopword-free docs score low.
    """
    n_tok = token_count(text)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * len_score
        + F.lit(0.3) * alpha_ratio(text)
        + F.lit(0.3) * F.least(stopword_ratio(text) * 4, F.lit(1.0)),
        4,
    )


def lang_id(text: Column) -> Column:
    """Deterministic marker-count language heuristic.

    Counts per-language marker substrings in the (lower-cased, padded) text;
    argmax wins, ties broken by fixed language order, zero hits -> 'und'.
    """
    import re as _re

    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        s = F.lit(0)
        for m in markers:
            # non-overlapping occurrence count of the literal marker —
            # identical semantics to (len - len(replace(m,'')))/len(m)
            # (both count left-to-right non-overlapping matches) but ONE
            # scan per marker with no full-text copy and no O(n)
            # UTF8 length passes (the r3 hot spot: doc_token_stats spent
            # ~2/3 of its time in 20 replace+length chains per doc)
            s = s + F.regexp_count(padded, F.lit(_re.escape(m)))
        scores[lang] = s
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # fixed order => deterministic tie-break: first language wins ties
    for lang in ["en", "de", "fr", "es"]:
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def content_thirds(text: Column) -> Column:
    """struct(p1, p2, p3): split text into thirds with the reference's
    EXACT slice boundaries (text_deal.py:24-32 ``content_split``):
    part1 = text[: third + (rem>0)], part2 ends at 2*third + (rem>1),
    part3 starts there. Quirk faithfully preserved: for rem == 1 part2 is
    one char SHORTER than a third (``'abcd'`` -> ``('ab', '', 'cd')``) —
    the boundaries are absolute offsets, not cumulative lengths, so
    part1's absorbed remainder char comes out of part2."""
    n = F.length(text)
    third = F.floor(n / 3).cast("int")
    rem = n % 3
    len1 = third + F.when(rem > 0, 1).otherwise(0)
    end2 = third * 2 + F.when(rem > 1, 1).otherwise(0)
    return F.struct(
        F.substring(text, F.lit(1), len1).alias("p1"),
        F.substring(text, len1 + 1, F.greatest(end2 - len1, F.lit(0))).alias("p2"),
        F.substring(text, end2 + 1, n).alias("p3"),
    )


def fingerprint64(text: Column) -> Column:
    """64-bit document fingerprint: xxhash64 of the normalized text
    (whitespace-collapsed, lower-cased) — the exact-dup key."""
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.xxhash64(norm)
