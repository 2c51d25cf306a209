"""Unit vectors for functions/scrub.py (PII, repetition rules, HTML
extraction) and operators/components.component_representatives.

The oracle gate (pii_scrub / quality_repetition / contamination_overlap /
dedup_keep_best / html_text_extract) checks cross-engine parity at sf0.01;
these tests pin the absolute semantics on hand-computed vectors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_webcrawler_spark.functions import scrub as SC


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "t string").select(col.alias("v")).head()[0]


class TestPII:
    def test_redact_email_ip_phone(self, spark):
        s = "mail bob.smith+x@sub.example.org ip 10.1.2.3 tel 555-123-4567 end"
        out = _one(spark, s, SC.pii_redact("t"))
        assert out == "mail <email> ip <ip> tel <phone> end"

    def test_counts(self, spark):
        s = "a@b.co and c.d@e.f.gg, 1.2.3.4 9.9.9.9 555-000-1111"
        row = (
            spark.createDataFrame([(s,)], "t string")
            .select(SC.pii_count("t", "email").alias("e"),
                    SC.pii_count("t", "ip").alias("i"),
                    SC.pii_count("t", "phone").alias("p")).head())
        assert (row.e, row.i, row.p) == (2, 2, 1)

    def test_email_wins_over_ip_inside_host(self, spark):
        # a numeric-dotted host inside an email is consumed by the email
        # redaction (patterns apply in PII_PATTERNS order)
        out = _one(spark, "x x9@127.0.0.1a.net x", SC.pii_redact("t"))
        assert out == "x <email> x"

    def test_clean_text_untouched(self, spark):
        s = "no pii here just words and 12 numbers"
        assert _one(spark, s, SC.pii_redact("t")) == s


class TestRepetition:
    def _metrics(self, spark, text):
        df = (spark.createDataFrame([(text,)], "t string")
              .select(SC.word_tokens("t").alias("t"))
              .withColumn("bg", SC.word_bigrams("t")))
        return df.select(
            F.size("t").alias("n"),
            SC.dup_frac("t").alias("dup"),
            SC.top_element_frac("t").alias("topw"),
            SC.top_element_frac("bg").alias("topb")).head()

    def test_hand_vector(self, spark):
        # tokens: a a a b  -> dup = (4-2)/4 = 0.5, top word = 3/4
        # bigrams: "a a","a a","a b" -> top bigram = 2/3
        m = self._metrics(spark, "a a a b")
        assert m.n == 4
        assert m.dup == pytest.approx(0.5)
        assert m.topw == pytest.approx(0.75)
        assert m.topb == pytest.approx(round(2 / 3, 6))

    def test_all_distinct(self, spark):
        m = self._metrics(spark, "one two three four")
        assert m.dup == 0.0 and m.topw == 0.25 and m.topb == pytest.approx(round(1 / 3, 6))

    def test_single_token_and_empty(self, spark):
        m = self._metrics(spark, "word")
        assert (m.n, m.dup, m.topw, m.topb) == (1, 0.0, 1.0, 0.0)
        m = self._metrics(spark, "...")
        assert (m.n, m.dup, m.topw, m.topb) == (0, 0.0, 0.0, 0.0)

    def test_word_shingles(self, spark):
        df = (spark.createDataFrame([("a b c d",)], "t string")
              .select(SC.word_tokens("t").alias("t"))
              .select(SC.word_shingles("t", 3).alias("sh")))
        assert df.head()[0] == ["a b c", "b c d"]


class TestHtml:
    HTML = ('<html><head><title>my page</title></head>'
            '<body><h1>Head</h1><p>hello  world</p>'
            '<a href="/x">x</a><a href="/y">y</a></body></html>')

    def test_title_text_links(self, spark):
        row = (spark.createDataFrame([(self.HTML,)], "t string")
               .select(SC.html_title("t").alias("title"),
                       SC.html_visible_text("t").alias("text"),
                       SC.html_link_count("t").alias("links")).head())
        assert row.title == "my page"
        assert row.text == "my page Head hello world x y"
        assert row.links == 2

    def test_no_title(self, spark):
        assert _one(spark, "<p>x</p>", SC.html_title("t")) == ""


class TestComponentRepresentatives:
    def test_keep_best(self, spark):
        from distributed_webcrawler_spark.operators.components import (
            component_representatives, connected_components)

        # two components: {1,2,3} (chain) and {10,11}
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "src bigint, dst bigint")
        comp = connected_components(edges)
        scores = spark.createDataFrame(
            [(1, 0.5), (2, 0.9), (3, 0.9), (10, 0.1), (11, 0.2)],
            "id bigint, score double")
        out = {r.component: r for r in
               component_representatives(comp, scores).collect()}
        assert out[1].keep_id == 2          # 0.9 tie -> smaller id
        assert out[1].n_members == 3 and out[1].best_score == 0.9
        assert out[10].keep_id == 11 and out[10].n_members == 2


class TestC4LineFilter:
    """C4 line rules (Raffel et al. 2020 §2.2): terminal punctuation,
    >= 5 words, no 'javascript'; doc gate on kept count + code braces."""

    def test_line_rules(self, spark):
        lines = [
            ("this line has five good words.", True),
            ("too short.", False),                       # < 5 words
            ("this line has no terminal punctuation", False),
            ("enable javascript to see the comments.", False),
            ("does this question line survive here?", True),
            ("", False),
        ]
        df = spark.createDataFrame([(t,) for t, _ in lines], "t string")
        got = [r.v for r in df.select(SC.c4_line_keep(F.col("t")).alias("v")).collect()]
        assert got == [want for _, want in lines]

    def test_kept_lines_and_doc_gate(self, spark):
        text = "\n".join([
            "the first sentence is long enough.",
            "menu",
            "another complete sentence makes the cut!",
        ])
        df = (spark.createDataFrame([(1, text), (2, "menu\nhome")],
                                    "doc_id long, text string")
              .withColumn("lines", SC.line_array("text"))
              .withColumn("kept", SC.c4_kept_lines("lines")))
        out = {r.doc_id: r for r in
               df.select("doc_id", "kept",
                         SC.c4_doc_keep(F.size("kept"), "text").alias("keep"))
                 .collect()}
        assert len(out[1].kept) == 2 and out[1].keep
        assert out[2].kept == [] and not out[2].keep

    def test_brace_drops_doc(self, spark):
        df = spark.createDataFrame([("code { return; }",)], "text string")
        assert not df.select(SC.c4_doc_keep(F.lit(5), "text").alias("v")).head().v


class TestGopherStructure:
    """Gopher structure rules (Rae et al. 2021 §A1.1): metric builders and
    the conjunctive gate over a hand-computable doc."""

    def test_metrics(self, spark):
        text = "- the quick fox.\nwent to a # pond...\n12 34"
        df = (spark.createDataFrame([(text,)], "t string")
              .withColumn("tok", SC.word_tokens("t"))
              .withColumn("lines", SC.line_array("t")))
        r = df.select(
            F.size("tok").cast("int").alias("n"),
            SC.mean_word_len("tok").alias("ml"),
            SC.alpha_word_frac("t").alias("af"),
            SC.stopword_hits("tok").alias("sh"),
            SC.symbol_ratio("t", F.size("tok").cast("int")).alias("sr"),
            SC.line_frac("lines", prefix="- ").alias("bf"),
            SC.line_frac("lines", suffix="...").alias("ef"),
        ).head()
        # tokens: the quick fox went to a pond 12 34 -> 9
        assert r.n == 9
        assert r.ml == round((3 + 5 + 3 + 4 + 2 + 1 + 4 + 2 + 2) / 9, 6)
        # whitespace words: -, the, quick, fox., went, to, a, #, pond..., 12, 34
        assert r.af == round(7 / 11, 6)
        assert r.sh == 3           # the, to, a
        assert r.sr == round(2 / 9, 6)   # one '#', one '...'
        assert r.bf == round(1 / 3, 6) and r.ef == round(1 / 3, 6)

    def test_gate_conjunction(self, spark):
        good = " ".join(["the quick brown fox jumps over a lazy dog"] * 5)
        df = (spark.createDataFrame([(1, good), (2, "tiny doc.")],
                                    "doc_id long, t string")
              .withColumn("tok", SC.word_tokens("t"))
              .withColumn("lines", SC.line_array("t")))
        n = F.size("tok").cast("int")
        out = {r.doc_id: r.keep for r in df.select(
            "doc_id",
            SC.gopher_keep(
                n, SC.mean_word_len("tok"), SC.symbol_ratio("t", n),
                SC.line_frac("lines", prefix="- "),
                SC.line_frac("lines", suffix="..."),
                SC.alpha_word_frac("t"), SC.stopword_hits("tok"),
            ).alias("keep")).collect()}
        assert out[1] is True      # 45 words, clean structure
        assert out[2] is False     # below GOPHER_MIN_WORDS
