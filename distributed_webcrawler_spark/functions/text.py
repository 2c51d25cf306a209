"""Text-analysis column builders for the training-data pipeline:
language-ID, quality scoring, token counting, document fingerprinting.

Every builder is a pure Column expression (JVM-side, whole-stage codegen —
no Python in the hot path) with semantics simple enough to re-state in
ANSI SQL for the DuckDB oracle. At 100 TB these run embedded in the scan
stage: no shuffle, no UDF serialization, full predicate/column pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker words per language for the n-gram/stopword heuristic language ID.
# Deliberately tiny + deterministic; parity with the SQL oracle matters more
# than linguistic accuracy here.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to "],
    "de": [" der ", " und ", " die ", " ist "],
    "fr": [" le ", " la ", " et ", " les "],
    "es": [" el ", " los ", " que ", " una "],
}


def _count_occurrences(text: Column, needle: str) -> Column:
    """#occurrences of needle via length arithmetic (portable to SQL)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def lang_score(text_col: str, lang: str) -> Column:
    """Marker-hit count for one language over ' '||lower(text)||' '."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    score = F.lit(0)
    for m in LANG_MARKERS[lang]:
        score = score + _count_occurrences(padded, m)
    return score


def lang_id(text_col: str) -> Column:
    """argmax over LANG_MARKERS scores; all-zero -> 'und'; ties break to the
    alphabetically-first language (a CASE evaluated in sorted order — the
    exact shape the SQL oracle restates)."""
    langs = sorted(LANG_MARKERS)
    scores = {lg: lang_score(text_col, lg) for lg in langs}
    m = F.greatest(*scores.values())
    result = F.when(m == 0, F.lit("und"))
    for lg in langs:
        result = result.when(scores[lg] == m, F.lit(lg))
    return result


def token_count(text_col: str) -> Column:
    """Alphanumeric token count (regexp-based; whitespace-split analog)."""
    return F.regexp_count(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"))


def punct_ratio(text_col: str) -> Column:
    t = F.col(text_col)
    non_alnum = F.length(F.regexp_replace(F.lower(t), "[a-z0-9 ]", ""))
    return (non_alnum / F.greatest(F.length(t), F.lit(1))).cast("double")


def stopword_ratio(text_col: str) -> Column:
    """English stopword hits / token count (quality heuristic)."""
    hits = lang_score(text_col, "en")
    return (hits / F.greatest(token_count(text_col), F.lit(1))).cast("double")


def quality_score(text_col: str) -> Column:
    """Composite quality in [0,1]: length band + punctuation + stopwords.
    Formula is arbitrary-but-fixed; the oracle restates it verbatim."""
    n = F.length(F.col(text_col))
    len_ok = F.when((n >= 100) & (n <= 20000), F.lit(1.0)).otherwise(
        F.when(n < 100, n / F.lit(100.0)).otherwise(F.lit(20000.0) / n)
    )
    p = punct_ratio(text_col)
    punct_ok = F.when(p < 0.2, F.lit(1.0)).otherwise(F.greatest(F.lit(0.0), F.lit(1.0) - (p - 0.2) * 2))
    s = stopword_ratio(text_col)
    stop_ok = F.least(F.lit(1.0), s * F.lit(4.0))
    return F.round((len_ok * 0.4 + punct_ok * 0.3 + stop_ok * 0.3).cast("double"), 6)


def fingerprint(text_col: str, max_chars: int = 64) -> Column:
    """Position-weighted rolling checksum over the first ``max_chars`` chars:
        sum_i ascii(c_i) * ((i*2654435761) % 1000003) % 1000000007
    Linear (no loop-carried dependency) so it is expressible in one SQL
    aggregate in both engines, yet position-sensitive like a rolling hash."""
    t = f"substring({text_col}, 1, {max_chars})"
    return F.expr(
        f"aggregate(transform(sequence(1, greatest(length({t}), 1)),"
        f" i -> ascii(substring({t}, i, 1)) * ((i * 2654435761) % 1000003)),"
        f" 0L, (acc, x) -> (acc + x) % 1000000007)"
    )
