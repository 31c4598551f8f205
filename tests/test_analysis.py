"""Tokenizer parity tests vs Tantivy-default behavior (SURVEY.md §4 item 1)."""

from fugu_tpu import analysis


def test_simple_split_lowercase():
    toks = analysis.tokenize("Hello, World! FOO-bar_baz")
    # '_' is not alphanumeric for Rust char::is_alphanumeric nor str.isalnum
    assert [t.text for t in toks] == ["hello", "world", "foo", "bar", "baz"]
    assert [t.position for t in toks] == [0, 1, 2, 3, 4]


def test_offsets():
    toks = analysis.tokenize("ab cd")
    assert (toks[0].offset_from, toks[0].offset_to) == (0, 2)
    assert (toks[1].offset_from, toks[1].offset_to) == (3, 5)


def test_numbers_and_unicode():
    toks = analysis.tokenize("café 42 中文")
    assert [t.text for t in toks] == ["café", "42", "中文"]


def test_remove_long_filter_40_bytes():
    ok39 = "a" * 39
    gone40 = "b" * 40
    toks = analysis.tokenize(f"{ok39} {gone40} tail")
    assert [t.text for t in toks] == [ok39, "tail"]
    # position gap where the long token was removed
    assert [t.position for t in toks] == [0, 2]


def test_long_filter_counts_utf8_bytes():
    # 14 three-byte chars = 42 bytes -> removed even though 14 chars
    long_cjk = "中" * 14
    assert analysis.tokenize_terms(f"x {long_cjk} y") == ["x", "y"]


def test_term_frequencies():
    assert analysis.term_frequencies("a b a A b. a") == {"a": 4, "b": 2}


def test_token_count_is_fieldnorm_input():
    assert analysis.token_count("one two, three!") == 3
    assert analysis.token_count("") == 0
