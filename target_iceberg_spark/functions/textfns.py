"""Text-analysis Column expressions: tokenization, n-gram shingles,
fingerprints, language-ID markers, quality features.

Everything is built-in expression API (split/transform/filter/md5) so
it runs JVM-side and — important for the oracle gate — has an exact
DuckDB SQL equivalent (string_split/list_transform/list_filter/md5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Lower-cased whitespace tokens. Single-space split (not regex \\s+)
    to stay bit-compatible with DuckDB string_split."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), " ")


def ngrams_of(token_array: Column | str, n: int = 3) -> Column:
    """Positional n-gram shingles (space-joined) over an ALREADY
    MATERIALIZED token-array column. Empty array when fewer than n
    tokens.

    Callers must materialize the token array into a column first
    (``withColumn``) — referencing ``tokens(text)`` here would embed the
    split expression inside the transform lambda, where Spark's codegen
    re-evaluates it per element (no CSE across lambda boundaries),
    turning shingling O(tokens^2) per document. Measured 9.8s -> <1s on
    260k shingles at sf0.1.
    """
    w = F.col(token_array) if isinstance(token_array, str) else token_array
    count = F.size(w) - (n - 1)
    make = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + k) for k in range(n)]),
    )
    return F.when(count >= 1, make).otherwise(F.array().cast("array<string>"))


def word_ngrams(text: Column | str, n: int = 3) -> Column:
    """n-gram shingles straight from a text column. Prefer
    tokenize-into-a-column + :func:`ngrams_of` in hot paths (see the
    CSE note there)."""
    return ngrams_of(tokens(text), n)


def token_set_fingerprint(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set. Two documents that are word-permutations of each other
    collide; md5 is engine-portable (same hex in Spark and DuckDB)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))


# Tiny per-language marker lexicons for the heuristic language-ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "que", "los"),
    "fr": ("le", "les", "et", "une"),
}
LANG_FALLBACK = "unknown"


def marker_hits(
    text: Column | str, lang: str, token_array: Column | str | None = None
) -> Column:
    """Count of tokens belonging to ``lang``'s marker lexicon. Pass a
    materialized ``token_array`` column in hot paths (single source of
    the matching rule — plans must not re-implement it inline)."""
    markers = LANG_MARKERS[lang]
    if token_array is not None:
        toks = F.col(token_array) if isinstance(token_array, str) else token_array
    else:
        toks = tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def langid_from_hits(hits: dict[str, Column]) -> Column:
    """Argmax over materialized marker-hit columns (one per language in
    LANG_MARKERS order), ties broken by that order; 'unknown' when no
    hits. Take COLUMN references, not raw hit expressions — inlining
    the tokenize+filter expression here repeats it ~3x per language in
    the CASE tree (no CSE), which measurably bloats codegen."""
    best = F.greatest(*hits.values())
    expr = F.lit(LANG_FALLBACK)
    # build CASE from last to first so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def langid(text: Column | str) -> Column:
    """Heuristic language-ID straight from a text column. Prefer
    materializing marker_hits into columns + :func:`langid_from_hits`
    in hot paths."""
    return langid_from_hits({lang: marker_hits(text, lang) for lang in LANG_MARKERS})
