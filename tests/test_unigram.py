"""Unigram-LM tokenizer (operators/unigram.py): segmentation properties,
determinism, trainer/encoder agreement, and the sf0.01 fixture pins."""

from __future__ import annotations

import math

import pytest

from covid19_spark.operators.unigram import (
    UNK_LOGPROB,
    _viterbi,
    train_unigram,
    unigram_tokenize,
)


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_viterbi_prefers_high_probability_pieces():
    logp = {"a": -3.0, "b": -3.0, "ab": -1.0, "abab": -5.0}
    pieces, score = _viterbi("abab", logp, max_piece_len=4)
    assert pieces == ["ab", "ab"]
    assert score == pytest.approx(-2.0)


def test_viterbi_tie_prefers_longer_last_piece():
    # two segmentations with EXACTLY equal scores: ['ab','c'] vs ['a','bc']
    logp = {"a": -1.0, "ab": -1.0, "bc": -1.0, "c": -1.0, "b": -1.0}
    pieces, _ = _viterbi("abc", logp, max_piece_len=2)
    # backward dp: last piece 'bc' (len 2) wins the tie over 'c' (len 1)
    assert pieces == ["a", "bc"]


def test_viterbi_unknown_chars_fall_back_to_singletons():
    logp = {"x": -1.0}
    pieces, score = _viterbi("xqx", logp, max_piece_len=3)
    assert pieces == ["x", "q", "x"]
    assert score == pytest.approx(-2.0 + UNK_LOGPROB)


def test_round_trip_over_trained_corpus(spark):
    texts = ["the quick brown fox", "the slow brown dog", "quick quick fox"]
    vocab = train_unigram(_corpus(spark, texts), vocab_size=40)
    logp = dict(vocab)
    for t in texts:
        for w in t.split(" "):
            pieces, score = _viterbi(w, logp, max_piece_len=6)
            assert "".join(pieces) == w
            assert score > 10 * UNK_LOGPROB  # no fallback needed on train words


def test_training_is_deterministic(spark):
    texts = ["aluminium amalgam alabama", "alabama aluminium", "amalgam amalgam"]
    df = _corpus(spark, texts)
    assert train_unigram(df, vocab_size=30) == train_unigram(df, vocab_size=30)


def test_vocab_respects_size_and_keeps_all_chars(spark):
    texts = [
        "abcdefg bcdefgh cdefghi defghij",
        "efghijk fghijkl ghijklm hijklmn",
        "abcdefg abcdefg bcdefgh cdefghi",
    ]
    chars = {c for t in texts for c in t if c != " "}
    small = train_unigram(_corpus(spark, texts), vocab_size=len(chars) + 3)
    pieces = [p for p, _ in small]
    # every seen char survives pruning (coverage guarantee) ...
    assert chars <= set(pieces)
    # ... and the multi-char budget is respected
    assert sum(1 for p in pieces if len(p) > 1) <= 3
    # logprobs are a (sub)distribution: all negative
    assert all(lp < 0 for _, lp in small)


def test_encoder_matches_trainer_segmentation(spark):
    texts = ["tokenize tokens token", "tokenize the token stream"]
    df = _corpus(spark, texts)
    vocab = train_unigram(df, vocab_size=50)
    logp = dict(vocab)
    out = {r.doc_id: r for r in unigram_tokenize(df, vocab).collect()}
    for i, t in enumerate(texts):
        words = t.split(" ")
        pieces, nll = [], 0.0
        for w in words:
            ps, s = _viterbi(w, logp, max_piece_len=6)
            pieces.extend(ps)
            nll -= s
        row = out[i]
        assert row.tokens == pieces
        assert row.n_words == len(words)
        assert row.n_tokens == len(pieces)
        assert row.nll == pytest.approx(nll)


def test_encoder_handles_unseen_text(spark):
    train = _corpus(spark, ["seen words only"])
    vocab = train_unigram(train, vocab_size=30)
    novel = spark.createDataFrame(
        [(0, "UNSEEN @#$ 象形文字")], "doc_id long, text string"
    )
    row = unigram_tokenize(novel, vocab).collect()[0]
    assert row.n_tokens >= row.n_words  # segments, never crashes
    assert all(tok for tok in row.tokens)


def test_nll_orders_in_domain_before_gibberish(spark):
    train = _corpus(
        spark, ["data table scan join", "table scan filter join", "data join"]
    )
    vocab = train_unigram(train, vocab_size=60)
    probe = spark.createDataFrame(
        [(0, "data table join"), (1, "zqxv wkjy pfft")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in unigram_tokenize(probe, vocab).collect()}
    assert rows[0].nll < rows[1].nll


def test_empty_and_null_text(spark):
    train = _corpus(spark, ["some training words"])
    vocab = train_unigram(train, vocab_size=30)
    df = spark.createDataFrame(
        [(0, ""), (1, None)], "doc_id long, text string"
    )
    rows = sorted(unigram_tokenize(df, vocab).collect(), key=lambda r: r.doc_id)
    for r in rows:
        assert r.n_words == 0 and r.n_tokens == 0 and r.nll == 0.0


def test_unigram_vocab_matches_fixture(spark):
    from tests.test_dedup import _assert_matches_fixture

    _assert_matches_fixture(spark, "unigram_vocab", ["piece"])


def test_unigram_tokenize_matches_fixture(spark):
    from tests.test_dedup import _assert_matches_fixture

    _assert_matches_fixture(spark, "unigram_tokenize", ["doc_id"])


def test_vocab_save_load_round_trip_and_encode_parity(spark, tmp_path):
    """The pretrained seam: a saved+reloaded vocabulary is bit-identical
    and the encoder produces identical segmentations from it."""
    from covid19_spark.operators.unigram import load_vocab, save_vocab

    df = _corpus(spark, ["persist the trained pieces", "trained pieces persist"])
    vocab = train_unigram(df, vocab_size=40)
    p = str(tmp_path / "vocab")
    save_vocab(vocab, spark, p)
    back = load_vocab(spark, p)
    assert back == vocab
    a = unigram_tokenize(df, vocab).orderBy("doc_id").collect()
    b = unigram_tokenize(df, back).orderBy("doc_id").collect()
    assert [(r.doc_id, r.tokens, r.nll) for r in a] == [
        (r.doc_id, r.tokens, r.nll) for r in b
    ]
