"""Pluggable tokenizers for packing and token counting.

A *tokenizer* here is any callable ``(text_col: str) -> Column`` whose
result is an ``array<string>`` of tokens — the layout math downstream
(:func:`.packing.pack_sequences`, :func:`.textstats.token_counts`) only
ever takes ``F.size`` of it, so swapping tokenizers can never change the
packing algebra, only the token counts feeding it.

Three implementations, in ascending fidelity / descending speed:

- :func:`whitespace_tokens` — split on whitespace. The default and the
  DuckDB-oracle mode (both engines agree exactly).
- :func:`regex_tokens` — BPE-ish pre-tokenization (alnum runs + single
  punctuation marks), still pure JVM codegen
  (``regexp_extract_all``) and still exactly reproducible in DuckDB.
- :func:`wordpiece_tokens` — greedy longest-match subword segmentation
  over a broadcast vocabulary (the BERT-WordPiece algorithm, with
  ``##``-continuation pieces). This is the "real tokenizer" shape: a
  driver-broadcast vocab dict + an Arrow-batched pandas UDF. At cluster
  scale the vocab (~30k pieces, a few MB) broadcasts once per executor
  and the UDF streams Arrow batches — the same plumbing an HF tokenizer
  would use, no per-row Python round trips.
- :func:`bpe_tokens` — byte-pair encoding by merge rank (Sennrich et
  al. 2016; the GPT-family vocabulary shape). Words pre-tokenized with
  :data:`BPE_SPLIT_RE` start as character sequences; the lowest-ranked
  adjacent pair present is merged repeatedly until none remains in the
  merges table. Same broadcast-dict + Arrow-batched UDF plumbing as
  WordPiece.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

Tokenizer = Callable[[str], Column]

#: BPE-ish pre-tokenizer: alnum runs, or one non-alnum-non-space mark.
BPE_SPLIT_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def whitespace_tokens(text_col: str = "text") -> Column:
    """Whitespace tokens, empties dropped (the default / oracle mode)."""
    return F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")


def regex_tokens(text_col: str = "text", pattern: str = BPE_SPLIT_RE) -> Column:
    """BPE-style pre-tokenization as a codegen expression; DuckDB
    reproduces it with its own ``regexp_extract_all``."""
    return F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)


def segment_wordpiece(
    word: str,
    vocab_set: frozenset[str],
    unk: str = "[UNK]",
    max_word_chars: int = 64,
) -> list[str]:
    """Greedy longest-match WordPiece segmentation of one word — the
    pure core of :func:`wordpiece_tokens`, exposed for direct
    (property-based) testing. A word with no full segmentation, or
    longer than ``max_word_chars``, becomes ``[unk]``."""
    if not word:
        return []
    if len(word) > max_word_chars:
        return [unk]
    pieces, start, n = [], 0, len(word)
    while start < n:
        end, piece = n, None
        while end > start:
            cand = word[start:end]
            if start > 0:
                cand = "##" + cand
            if cand in vocab_set:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [unk]
        pieces.append(piece)
        start = end
    return pieces


def wordpiece_tokens(
    vocab: Iterable[str],
    text_col: str = "text",
    unk: str = "[UNK]",
    max_word_chars: int = 64,
) -> Column:
    """Greedy longest-match WordPiece over a broadcast vocabulary.

    Words (whitespace-split, lowercased) are segmented left-to-right:
    the longest vocab prefix is taken, then the remainder is matched
    against ``##``-prefixed continuation pieces; a word with no match
    (or longer than ``max_word_chars``) becomes ``unk``. Deterministic
    given the vocab, so tests can pin exact outputs.

    The vocab is captured in the UDF closure — Spark ships it once per
    executor with the task broadcast, the standard pattern for
    dictionary-backed tokenizers.
    """
    vocab_set = frozenset(vocab)

    @F.pandas_udf("array<string>")
    def _wp(texts):
        import pandas as pd

        def seg_text(text) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in text.lower().split():
                out.extend(segment_wordpiece(w, vocab_set, unk, max_word_chars))
            return out

        return pd.Series([seg_text(t) for t in texts])

    return _wp(F.col(text_col))


def merge_word_bpe(
    word: str,
    ranks: dict[tuple[str, str], int],
    max_word_chars: int = 64,
) -> list[str]:
    """BPE-merge one pre-token by rank — the pure core of
    :func:`bpe_tokens`, exposed for direct (property-based) testing.

    The word starts as its character sequence; each step merges *every*
    occurrence of the adjacent pair with the lowest rank in ``ranks``,
    until no adjacent pair is ranked. Characters never seen in any merge
    simply survive as single-char tokens (BPE has no UNK: the base
    alphabet is always representable). Over-long words are left
    unmerged (cost guard, mirroring WordPiece's ``max_word_chars``)."""
    if not word:
        return []
    parts = list(word)
    if len(parts) > max_word_chars:
        return parts
    while len(parts) > 1:
        best_rank, best_pair = None, None
        for pair in zip(parts, parts[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        merged: list[str] = []
        i = 0
        while i < len(parts):
            if (
                i + 1 < len(parts)
                and (parts[i], parts[i + 1]) == best_pair
            ):
                merged.append(parts[i] + parts[i + 1])
                i += 2
            else:
                merged.append(parts[i])
                i += 1
        parts = merged
    return parts


def bpe_tokens(
    merges: Iterable[tuple[str, str]],
    text_col: str = "text",
    pattern: str = BPE_SPLIT_RE,
    max_word_chars: int = 64,
) -> Column:
    """Byte-pair encoding by merge rank over a broadcast merges table —
    the GPT-family tokenizer shape (Sennrich et al. 2016 trainable
    merges, applied greedily lowest-rank-first at encode time).

    ``merges`` is the *ordered* merge list (rank = position, as in a
    ``merges.txt``); text is lowercased and pre-tokenized with
    ``pattern`` (the same BPE pre-split :func:`regex_tokens` uses), and
    each pre-token is merged independently via :func:`merge_word_bpe`.

    The ranks dict rides the UDF closure — shipped once per executor
    with the task broadcast, applied over Arrow batches; identical
    plumbing to :func:`wordpiece_tokens`, so everything downstream
    (packing layout, token counts) is tokenizer-swap-safe by the same
    invariance tests."""
    import re as _re

    ranks = {tuple(pair): i for i, pair in enumerate(merges)}
    rx = _re.compile(pattern)

    @F.pandas_udf("array<string>")
    def _bpe(texts):
        import pandas as pd

        def seg_text(text) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in rx.findall(text.lower()):
                out.extend(merge_word_bpe(w, ranks, max_word_chars))
            return out

        return pd.Series([seg_text(t) for t in texts])

    return _bpe(F.col(text_col))


def train_bpe_merges(
    docs,
    n_merges: int = 50,
    text_col: str = "text",
    pattern: str = BPE_SPLIT_RE,
    min_freq: int = 2,
    max_word_chars: int = 64,
) -> list[tuple[str, str]]:
    """Learn a BPE merges table from the corpus (Sennrich et al. 2016
    §3.2) as DataFrame supersteps — the trainer for :func:`bpe_tokens`.

    The corpus is scanned ONCE into a word-frequency table (the same
    lowercase + ``pattern`` pre-tokenization :func:`bpe_tokens`
    applies at encode time); every training iteration then runs on
    that vocab-bounded table (distinct pre-tokens, ≪ corpus — the same
    compaction industrial trainers use), so 100 TB of text costs one
    aggregation plus ``n_merges`` tiny jobs:

    - **count** — adjacent symbol pairs exploded from each word's
      current segmentation, weighted by word frequency; hash-aggregate
      with map-side partial agg; the arg-max lands on the driver as ONE
      row (ties broken by (count desc, pair asc) — a total order, so
      training is deterministic in any engine/partitioning).
    - **merge** — the chosen pair applied to every word's segmentation
      as a single left-to-right non-overlapping pass, expressed as a
      pure codegen ``aggregate`` lambda (no Python worker): a merged
      token can never equal the pair's left element (``pa+pb != pa``),
      so "append or fuse with the accumulator's tail" reproduces
      :func:`merge_word_bpe`'s one-pass semantics exactly
      (property-tested against it).

    Per-iteration tables persist/unpersist (the pagerank superstep
    lineage discipline). Words longer than ``max_word_chars`` are
    excluded from training (encode time leaves them unmerged anyway);
    training stops early when the best pair's count drops below
    ``min_freq``. Returns the ordered merges list ``bpe_tokens``
    consumes."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    vocab = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .filter(F.length("w") <= max_word_chars)
        .select("freq", chars.alias("parts"))
        .persist()
    )
    vocab.count()

    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            pair_structs = F.when(
                F.size("parts") > 1,
                F.transform(
                    F.sequence(F.lit(1), F.size("parts") - 1),
                    lambda i: F.struct(
                        F.element_at("parts", i).alias("pa"),
                        F.element_at("parts", i + 1).alias("pb"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pa:string,pb:string>>"))
            best = (
                vocab.select("freq", F.explode(pair_structs).alias("p"))
                .groupBy("p.pa", "p.pb")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.col("cnt").desc(), F.col("pa").asc(), F.col("pb").asc())
                .limit(1)
                .collect()
            )
            if not best or best[0].cnt < min_freq:
                break
            pa, pb = best[0].pa, best[0].pb
            merges.append((pa, pb))
            fused = F.aggregate(
                "parts",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(pa))
                    & (x == F.lit(pb)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.lit(pa + pb)),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            )
            new_vocab = vocab.select("freq", fused.alias("parts")).persist()
            new_vocab.count()
            vocab.unpersist()
            vocab = new_vocab
    finally:
        vocab.unpersist()
    return merges


def merges_to_text(merges: list[tuple[str, str]]) -> str:
    """Serialize a merges table to the GPT-2/HF ``merges.txt`` wire
    format: ``#version`` header, one space-separated pair per line,
    rank = line order — so a table trained here drops into any
    tokenizer library, and published merges files load here."""
    lines = ["#version: 0.2"]
    lines += [f"{a} {b}" for a, b in merges]
    return "\n".join(lines) + "\n"


def merges_from_text(text: str) -> list[tuple[str, str]]:
    """Parse a ``merges.txt`` payload (rank = order). Only the
    *leading* ``#version`` line is a header (the HF format); a ``#``
    anywhere else is a legitimate merge symbol. Raises on malformed
    lines — a merges file with the wrong arity is corrupt, not
    ignorable."""
    out: list[tuple[str, str]] = []
    for i, line in enumerate(text.splitlines()):
        line = line.rstrip("\n")
        if not line or (i == 0 and line.startswith("#version")):
            continue
        parts = line.split(" ")
        if len(parts) != 2 or not parts[0] or not parts[1]:
            raise ValueError(f"malformed merges line {i + 1}: {line!r}")
        out.append((parts[0], parts[1]))
    return out
