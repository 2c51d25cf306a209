"""Data-scrubbing column builders for the training-data pipeline:
PII detection/redaction, Gopher-style repetition quality rules, and
HTML title/visible-text extraction.

Like functions/text.py, every builder is a pure Column expression
(JVM-side, whole-stage codegen, no Python in the hot path) restateable in
ANSI SQL for the DuckDB oracle. Regexes stay inside the Java-regex /
RE2 common subset (character classes, bounded+greedy quantifiers, no
alternation, no back-references, no look-around) so both engines match
identical spans.

At 100 TB these run embedded in the scan stage — no shuffle, no UDF
serialization. The repetition metrics materialize the token array once
per row and reuse it (O(tokens * distinct) in-row work, zero exchange);
a production corpus with mega-token documents would cap the array via
``max_tokens``, exactly like text.fingerprint caps at ``max_chars``.

Reference parity: the reference crawler stores Jsoup's ``doc.title()``
and body text per page (BasicCrawler.java:96-105); ``html_title`` /
``html_visible_text`` are the declarative restatement of that extraction
(tag-strip + whitespace collapse) over raw markup.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- PII -------------------------------------------------------------------
# Detection patterns, ordered: redaction applies them in this order so a
# span is consumed by the first family that matches it (emails before IPs
# before phones — an IP-looking fragment inside an email host is redacted
# as part of the email).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
    ("phone", r"[0-9]{3}-[0-9]{3}-[0-9]{4}"),
]


def pii_count(text_col: str, kind: str) -> Column:
    """#matches of one PII family (kind in {email, ip, phone})."""
    pattern = dict(PII_PATTERNS)[kind]
    return F.regexp_count(F.col(text_col), F.lit(pattern)).cast("int")


def pii_redact(text_col: str) -> Column:
    """Replace every PII span with its <kind> token, in PII_PATTERNS order."""
    out = F.col(text_col)
    for kind, pattern in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, f"<{kind}>")
    return out


# --- repetition / quality rules (Gopher-style) -----------------------------

def word_tokens(text_col: str) -> Column:
    """Lower-cased alphanumeric token array (same tokenizer as
    text.token_count, materialized as an array for reuse)."""
    return F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")


def word_bigrams(tokens_col: str) -> Column:
    """Adjacent-token bigram array ('w1 w2'); empty when < 2 tokens.
    (sequence() is guarded: Spark's sequence(1, 0) counts DOWN.)"""
    return F.expr(
        f"CASE WHEN size({tokens_col}) < 2 THEN array()"
        f" ELSE transform(sequence(1, size({tokens_col}) - 1),"
        f"   i -> concat(element_at({tokens_col}, i), ' ', element_at({tokens_col}, i + 1))) END"
    )


def word_shingles(tokens_col: str, k: int) -> Column:
    """Word k-gram array joined by single spaces; caller filters rows with
    size(tokens) < k first (contamination checks use k=13 in production;
    the oracle-gated query uses a small k so the tiny fixture has overlap)."""
    parts = ", ' ', ".join(f"element_at({tokens_col}, i + {j})" for j in range(k))
    return F.expr(
        f"transform(sequence(1, size({tokens_col}) - {k - 1}), i -> concat({parts}))"
    )


def dup_frac(arr_col: str) -> Column:
    """Fraction of array elements that are repeats of an earlier element."""
    return F.round(
        (F.size(arr_col) - F.size(F.array_distinct(F.col(arr_col))))
        / F.greatest(F.size(arr_col), F.lit(1)), 6).cast("double")


def top_element_frac(arr_col: str) -> Column:
    """Fraction of the array occupied by its single most frequent element
    (0.0 for empty arrays). O(n * distinct) in-row, no shuffle — the
    explode+window restatement is only needed when rows exceed memory."""
    return F.expr(
        f"CASE WHEN size({arr_col}) < 1 THEN cast(0.0 as double)"
        f" ELSE cast(round(array_max(transform(array_distinct({arr_col}),"
        f"   w -> size(filter({arr_col}, x -> x = w)))) / size({arr_col}), 6) as double) END"
    )


# Gopher-style gate thresholds (arbitrary-but-fixed; tuned so the synthetic
# corpus splits — the oracle restates them verbatim).
REP_MAX_DUP_WORD = 0.55
REP_MAX_TOP_WORD = 0.11
REP_MAX_TOP_BIGRAM = 0.06


def repetition_keep(dup_word: Column, top_word: Column, top_bigram: Column) -> Column:
    return (
        (dup_word <= REP_MAX_DUP_WORD)
        & (top_word <= REP_MAX_TOP_WORD)
        & (top_bigram <= REP_MAX_TOP_BIGRAM)
    )


# --- Gopher document-structure rules (Rae et al. 2021, public literature) ---
# "Scaling Language Models: ... Gopher" §A1.1 quality heuristics: word-count
# band, mean-word-length band, symbol-to-word ratio, bullet-line and
# ellipsis-line fractions, alphabetic-word fraction, and a minimum count of
# distinct stop words. Thresholds are the published shape re-banded so the
# synthetic word-soup corpus actually splits (production values noted inline);
# the oracle restates them verbatim. All pure Column exprs — at 100 TB these
# run embedded in the scan stage, zero shuffle, no UDF.

GOPHER_MIN_WORDS = 30          # production: 50
GOPHER_MAX_WORDS = 110         # production: 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.05  # production: 0.1 ('#' or '...' per word)
GOPHER_MAX_BULLET_FRAC = 0.20   # production: 0.90 (of lines)
GOPHER_MAX_ELLIPSIS_FRAC = 0.20  # production: 0.30
GOPHER_MIN_ALPHA_WORD_FRAC = 0.90  # production: 0.80
GOPHER_MIN_STOPWORDS = 2        # distinct hits from GOPHER_STOPWORDS
GOPHER_STOPWORDS = ["the", "a", "of", "to", "and", "that", "have", "with"]


def mean_word_len(tokens_col: str) -> Column:
    """Mean alphanumeric-token length, 0.0 for empty docs (round 6 so both
    engines' float formatting agrees)."""
    return F.expr(
        f"CASE WHEN size({tokens_col}) < 1 THEN cast(0.0 as double)"
        f" ELSE cast(round(aggregate({tokens_col}, 0, (s, w) -> s + length(w))"
        f"   / size({tokens_col}), 6) as double) END"
    )


def alpha_word_frac(text_col: str) -> Column:
    """Fraction of whitespace-split words containing at least one letter
    (Gopher's 'words with an alphabetic character' rule)."""
    ws = f"filter(split({text_col}, '[ \\\\n]+'), w -> w != '')"
    return F.expr(
        f"CASE WHEN size({ws}) < 1 THEN cast(0.0 as double)"
        f" ELSE cast(round(size(filter({ws}, w -> lower(w) rlike '[a-z]'))"
        f"   / size({ws}), 6) as double) END"
    )


def stopword_hits(tokens_col: str) -> Column:
    """#distinct GOPHER_STOPWORDS present in the token array."""
    lits = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return F.expr(
        f"size(array_intersect(array_distinct({tokens_col}), array({lits})))"
    ).cast("int")


def symbol_ratio(text_col: str, n_words: Column) -> Column:
    """('#' hits + '...' hits) / word count (Gopher symbol-to-word ratio)."""
    n_sym = (F.regexp_count(F.col(text_col), F.lit("#"))
             + F.regexp_count(F.col(text_col), F.lit(r"\.\.\.")))
    return F.round(n_sym / F.greatest(n_words, F.lit(1)), 6).cast("double")


def line_frac(lines_col: str, prefix: str | None = None,
              suffix: str | None = None) -> Column:
    """Fraction of lines with a given prefix ('- ' bullets) or suffix
    ('...' ellipsis endings); 0.0 when the doc has no lines."""
    # escape quotes: the needle is interpolated into a SQL expr string
    if prefix is not None:
        pred = "startswith(l, '{}')".format(prefix.replace("'", "\\'"))
    else:
        pred = "endswith(l, '{}')".format(suffix.replace("'", "\\'"))
    return F.expr(
        f"CASE WHEN size({lines_col}) < 1 THEN cast(0.0 as double)"
        f" ELSE cast(round(size(filter({lines_col}, l -> {pred}))"
        f"   / size({lines_col}), 6) as double) END"
    )


def gopher_keep(n_words: Column, mean_len: Column, sym: Column,
                bullet: Column, ellipsis: Column, alpha: Column,
                stops: Column) -> Column:
    """The conjunctive Gopher gate over the seven structure metrics."""
    return (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_len.between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (sym <= GOPHER_MAX_SYMBOL_RATIO)
        & (bullet <= GOPHER_MAX_BULLET_FRAC)
        & (ellipsis <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (alpha >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (stops >= GOPHER_MIN_STOPWORDS)
    )


# --- C4-style line cleaning (Raffel et al. 2020, public literature) ---------
# "Exploring the Limits of Transfer Learning" §2.2: keep only lines that end
# in a terminal punctuation mark, have >= 5 words, and don't carry the
# boilerplate "javascript" marker; drop pages containing code braces. The
# terminal-punctuation set is simplified to [.!?] (no curly quotes) so both
# regex engines match identical spans.

C4_MIN_LINE_WORDS = 5
C4_BANNED_WORD = "javascript"
C4_TERMINAL_RE = "[.!?]$"
C4_MIN_KEPT_LINES = 2  # doc-level gate (C4 uses >= 3 sentences; lines here)


def line_array(text_col: str) -> Column:
    """Newline-split line array (the unit of C4 filtering)."""
    return F.split(F.col(text_col), "\n")


def c4_line_keep(line: Column) -> Column:
    """Per-line C4 keep rule as a pure Column predicate (usable as a
    filter() lambda body — runs in-row, zero shuffle)."""
    n_words = F.size(F.regexp_extract_all(F.lower(line), F.lit("[a-z0-9]+"), F.lit(0)))
    return (
        (n_words >= C4_MIN_LINE_WORDS)
        & line.rlike(C4_TERMINAL_RE)
        & ~F.lower(line).contains(C4_BANNED_WORD)
    )


def c4_kept_lines(lines_col: str) -> Column:
    """filter() the line array by the C4 keep rule (in-row, codegen)."""
    return F.filter(F.col(lines_col), c4_line_keep)


def c4_doc_keep(n_kept_col: Column, text_col: str) -> Column:
    """Doc-level gate: enough surviving lines and no code braces."""
    return (n_kept_col >= C4_MIN_KEPT_LINES) & ~F.col(text_col).contains("{")


# --- HTML extraction -------------------------------------------------------

_TITLE_RE = "<title>([^<]*)</title>"
_TAG_RE = "<[^>]*>"


def html_title(html_col: str) -> Column:
    """First <title> element's text ('' when absent), Jsoup doc.title()."""
    return F.regexp_extract(F.col(html_col), _TITLE_RE, 1)


def html_visible_text(html_col: str) -> Column:
    """Tag-strip + whitespace collapse + trim — Jsoup body.text() shape."""
    stripped = F.regexp_replace(F.col(html_col), _TAG_RE, " ")
    return F.trim(F.regexp_replace(stripped, " +", " "))


def html_link_count(html_col: str) -> Column:
    """#anchor-with-href occurrences (the link-extraction fan-out width)."""
    return F.regexp_count(F.col(html_col), F.lit("<a href")).cast("int")
