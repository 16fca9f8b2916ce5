"""Golden tests for the analyzer — the reference's analyzer contract is
`standard` tokenizer → lowercase → asciifolding(preserve_original: true)
(/root/reference/src/search-ingest/schemas.cr:62-77)."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from search_ingest_spark.analysis import (
    analyze,
    extract_text,
    fold_ascii,
    standard_tokens,
)


class TestStandardTokens:
    def test_basic_words(self):
        assert standard_tokens("The quick brown fox") == ["The", "quick", "brown", "fox"]

    def test_punctuation_splits(self):
        assert standard_tokens("hello, world! foo-bar") == ["hello", "world", "foo", "bar"]

    def test_apostrophe_joins_letters(self):
        # UAX#29 MidNumLet: apostrophe between letters keeps one token
        assert standard_tokens("don't O'Neill") == ["don't", "O'Neill"]

    def test_numbers_with_separators(self):
        assert standard_tokens("pi is 3.14, not 3,000") == ["pi", "is", "3.14", "not", "3,000"]

    def test_dot_does_not_join_letters(self):
        assert standard_tokens("end.Start") == ["end", "Start"]

    def test_alnum_mix_single_token(self):
        assert standard_tokens("abc123 x86_64") == ["abc123", "x86_64"]

    def test_empty_and_none(self):
        assert standard_tokens("") == []
        assert standard_tokens("   \t\n ") == []

    def test_unicode_words(self):
        assert standard_tokens("Zürich café naïve") == ["Zürich", "café", "naïve"]


class TestFoldAscii:
    def test_identity_on_ascii(self):
        assert fold_ascii("hello42") == "hello42"

    def test_accents(self):
        assert fold_ascii("café") == "cafe"
        assert fold_ascii("naïve") == "naive"
        assert fold_ascii("zürich") == "zurich"
        assert fold_ascii("déjà") == "deja"

    def test_special_latin(self):
        assert fold_ascii("straße") == "strasse"
        assert fold_ascii("œuvre") == "oeuvre"
        assert fold_ascii("øre") == "ore"
        assert fold_ascii("þing") == "thing"


class TestAnalyze:
    def test_lowercases(self):
        terms, n = analyze("Hello World")
        assert terms == ["hello", "world"]
        assert n == 2

    def test_preserve_original_stacks_both_forms(self):
        # "Café" → folded 'cafe' AND original 'café'; ONE position
        terms, n = analyze("Café")
        assert terms == ["cafe", "café"]
        assert n == 1

    def test_positions_discount_overlaps(self):
        # Lucene BM25 length norm uses positions (discountOverlaps=true):
        # stacked fold-originals must not inflate doc length
        terms, n = analyze("café café hello")
        assert n == 3
        assert terms.count("cafe") == 2 and terms.count("café") == 2

    def test_ascii_text_has_no_stacking(self):
        terms, n = analyze("plain ascii text")
        assert len(terms) == n == 3


class TestExtractText:
    def test_strips_markup(self):
        html = b"<html><body><p>Hello <b>World</b></p></body></html>"
        assert extract_text(html) == "Hello World"

    def test_drops_script_and_style(self):
        html = b"<p>keep</p><script>var x = 'drop';</script><style>p{}</style><p>this</p>"
        assert extract_text(html) == "keep this"

    def test_deterministic_byte_identical(self):
        html = "<p>café page</p>".encode()
        assert extract_text(html) == extract_text(html) == "café page"

    def test_none_and_empty(self):
        assert extract_text(None) == ""
        assert extract_text(b"") == ""

    @given(st.binary(max_size=500))
    def test_total_function(self, blob):
        # never raises, always deterministic
        assert extract_text(blob) == extract_text(blob)


@given(st.text(max_size=300))
def test_analyze_total_and_deterministic(text):
    t1 = analyze(text)
    t2 = analyze(text)
    assert t1 == t2
    terms, n = t1
    assert len(terms) >= n  # stacking only adds
    assert all(t == t.lower() for t in terms)


class TestCJKSegmentation:
    """Lucene StandardTokenizer parity on CJK: Han/Hiragana emit one
    token per character, Katakana chains into runs, and CJK never
    merges with adjacent Latin."""

    def test_han_unigrams(self):
        from search_ingest_spark.analysis import standard_tokens

        assert standard_tokens("漢字検索") == ["漢", "字", "検", "索"]

    def test_katakana_runs_chain(self):
        from search_ingest_spark.analysis import standard_tokens

        assert standard_tokens("データベース処理") == [
            "データベース", "処", "理"
        ]

    def test_hiragana_single_chars(self):
        from search_ingest_spark.analysis import standard_tokens

        assert standard_tokens("これは") == ["こ", "れ", "は"]

    def test_cjk_latin_boundary(self):
        from search_ingest_spark.analysis import standard_tokens

        assert standard_tokens("東京tower spark漢") == [
            "東", "京", "tower", "spark", "漢"
        ]

    def test_mixed_sentence_analyze(self):
        from search_ingest_spark.analysis import analyze

        terms, n_pos = analyze("Spark处理数据 3.14")
        assert terms == ["spark", "处", "理", "数", "据", "3.14"]
        assert n_pos == 6
