"""Text-analysis primitives for training-data pipelines.

Pure native-function Columns (split / regexp / transform) — the hot
path stays inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed text → array<string>."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


#: tiny per-language stopword sets for the heuristic language-ID.
#: Real pipelines use larger lists / char-n-gram models; the mechanism
#: (columnar token-set scoring, priority argmax) is identical.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "los", "y"),
    "fr": ("le", "les", "des", "et", "une"),
    "de": ("der", "die", "das", "und", "ist"),
}
#: deterministic priority order for argmax ties
LANG_PRIORITY = ("en", "es", "fr", "de")


def stopword_count(toks: Column, lang: str) -> Column:
    """# tokens that are stopwords of ``lang``."""
    words = list(STOPWORDS[lang])
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def predicted_lang(text: Column | str) -> Column:
    """Heuristic language-ID: stopword-hit argmax with priority-order
    tie-break; 'und' (undetermined) when no stopword matches."""
    toks = tokens(text)
    scores = {lang: stopword_count(toks, lang) for lang in LANG_PRIORITY}
    all_zero = None
    for lang in LANG_PRIORITY:
        z = scores[lang] == 0
        all_zero = z if all_zero is None else (all_zero & z)
    expr = F.lit("und")
    # build the CASE from lowest priority upward so 'en' wins ties
    for lang in reversed(LANG_PRIORITY):
        others = [scores[o] for o in LANG_PRIORITY if o != lang]
        cond = F.lit(True)
        for o in others:
            cond = cond & (scores[lang] >= o)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return F.when(all_zero, F.lit("und")).otherwise(expr)


def punct_count(text: Column | str) -> Column:
    """# punctuation chars, computed as length delta after stripping."""
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c) - F.length(F.regexp_replace(c, r"[.,!?;:]", ""))


def digit_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic in [0,1]-ish: rewards moderate
    length and stopword presence, penalizes punctuation/digit noise.
    Deterministic closed-form — identical in the DuckDB oracle."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c).cast("double")
    n_chr = F.length(c).cast("double")
    stop_ratio = (
        stopword_count(tokens(c), "en").cast("double")
        / F.greatest(n_tok, F.lit(1.0))
    )
    punct_ratio = punct_count(c).cast("double") / F.greatest(n_chr, F.lit(1.0))
    digit_ratio = digit_count(c).cast("double") / F.greatest(n_chr, F.lit(1.0))
    len_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * len_term
        + F.lit(0.4) * F.least(stop_ratio * 5.0, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least((punct_ratio + digit_ratio) * 5.0, F.lit(1.0))),
        6,
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """n-word shingles (space-joined) → array<string>.

    Documents shorter than ``n`` words yield a single shingle of the
    whole text, so no document silently disappears from dedup.

    Built as an element-wise ``zip_with`` of the n shifted token
    slices — NOT as ``transform(indices, i -> slice(toks, i, n))``.
    The two forms emit identical arrays, but in the transform form
    ``toks`` (the regex split of the document) sits INSIDE the lambda,
    and Spark re-evaluates a lambda's captured subexpressions per
    ELEMENT: the tokenizer ran once per emitted shingle, O(|tokens|)
    splits per row (measured 16x on 400-token rows).  Here the slices
    are ordinary ``zip_with`` array arguments, evaluated once per ROW;
    the lambda sees only its element pair.  ``concat_ws`` mirrors
    ``array_join``'s null-skipping, so even impossible null-token
    edges agree; the short-document branch and the NULL-text result
    (``[NULL]``) are bit-identical to the old form.
    """
    if n < 1:
        raise ValueError(f"word_shingles: n must be >= 1, got {n}")
    toks = tokens(text)
    cnt = F.size(toks)
    m = F.greatest(cnt - (n - 1), F.lit(0))
    parts = [F.slice(toks, k + 1, m) for k in range(n)]
    joined = parts[0]
    for p in parts[1:]:
        joined = F.zip_with(joined, p, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(cnt >= n, joined).otherwise(
        F.array(F.array_join(toks, " "))
    )


def chunk_windows(
    text,  # Column | str
    size: int = 50,
    stride: int = 25,
):
    """Overlapping token-window chunks → array<string> of chunk texts.

    The context-window chunking step of a training-data pipeline:
    windows of ``size`` whitespace tokens every ``stride`` tokens, the
    final partial window included iff it starts before the text ends.
    Pure higher-order expressions (sequence → transform → slice →
    array_join) — per-row fan-out happens executor-side via the
    caller's explode, never in Python.

    The token array is BOUND through a one-element outer ``transform``
    before the per-window lambda references it: Spark re-evaluates a
    lambda's captured subexpressions per ELEMENT (the word_shingles
    lesson), so with ``toks`` captured directly the regex split re-ran
    once per emitted window — |tokens|/stride extra tokenizations per
    row (measured 7x on 800-token rows).  As an outer lambda variable
    it is evaluated once per row and each window sees a plain variable
    reference.  Emitted windows are byte-identical to the captured
    form (fuzz + edge-case pinned in tests)."""
    toks = tokens(text)

    def _windows(t):
        n = F.size(t)
        n_chunks = F.greatest(
            F.ceil((n - F.lit(size)) / F.lit(stride)).cast("int") + F.lit(1),
            F.lit(1),
        )
        starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
        return F.transform(
            starts, lambda s: F.array_join(F.slice(t, s + 1, size), " ")
        )

    return F.element_at(F.transform(F.array(toks), _windows), 1)
