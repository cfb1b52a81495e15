"""WordPiece tokenizer: greedy longest-match semantics and coverage."""

from __future__ import annotations

from pyspark.sql import Row

from ups_crossref_etl_spark.operators.wordpiece import (
    _greedy,
    wordpiece_segment_words,
    wordpiece_vocab,
)


def test_greedy_longest_match_and_continuation_convention():
    initial = {"un", "u", "n", "a", "f", "affable", "un/a"}
    cont = {"##"} | {"affable", "able", "a", "f", "b", "l", "e", "ff"}
    # at pos 0 pick the longest initial piece; then longest continuations
    seg, n = _greedy("unaffable", initial, cont, max_len=10)
    assert seg == "un ##affable"
    assert n == 2


def test_greedy_unk_when_char_missing():
    seg, n = _greedy("xyz", {"x"}, {"y"}, max_len=4)  # no 'z' continuation
    assert (seg, n) == ("[UNK]", 1)


def test_vocab_keeps_single_chars_prunes_rare(spark):
    wc = spark.createDataFrame(
        [Row(word="banana", cnt=10), Row(word="band", cnt=1)]
    )
    v = wordpiece_vocab(wc, max_piece_len=3, min_count=8).collect()
    pieces = {(r["piece"], r["is_cont"]) for r in v}
    # 'ban' initial appears in both words: 10 + 1 = 11 >= 8 -> kept
    assert ("ban", False) in pieces
    # 'and' continuation appears only in band (cnt 1) -> pruned
    assert ("and", True) not in pieces
    # single chars always kept, both inventories where they occur
    assert ("b", False) in pieces and ("a", True) in pieces


def test_segment_words_round_trip(spark):
    wc = spark.createDataFrame(
        [Row(word="banana", cnt=5), Row(word="ban", cnt=3)]
    )
    vocab = wordpiece_vocab(wc, max_piece_len=3, min_count=0)
    out = {r["word"]: r for r in wordpiece_segment_words(wc, vocab, 3).collect()}
    # every piece sequence reconstructs the word
    for w, r in out.items():
        rebuilt = "".join(p.removeprefix("##") for p in r["seg"].split(" "))
        assert rebuilt == w
        assert r["n_pieces"] == len(r["seg"].split(" "))
