"""Property-based tests (hypothesis) for the pure-Python scalar cores
(F1/F2) and the streaming/batch sessionize equivalence. These run
without Spark — fast, wide input coverage."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from webpagesgraphdatabase_spark import functions as fn

# Alphabet of plausible URL characters. Deliberately excluded, with the
# reference's own behavior preserved (fidelity over cleanliness):
# '%' (urllib.quote double-encodes it on re-normalization, so the
# reference's normalize is NOT idempotent on pre-encoded input) and
# '#'/'?' (fragment/query markers make urlparse put everything after
# them outside scheme://netloc/path, which the reference drops).
url_text = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789.-_~/: &=+",
    max_size=80,
)


@given(url_text)
@settings(max_examples=300, deadline=None)
def test_normalize_url_idempotent_on_wellformed(raw):
    once = fn.normalize_url_py(raw)
    # degenerate garbage (empty netloc, bare scheme) is garbage-out in
    # the reference too, and any percent-escape in the output gets
    # double-encoded on re-entry (reference behavior: quote() is applied
    # unconditionally, main.py:104) — the contract covers host-shaped,
    # escape-free results
    if once.startswith(("http://", "https://")) and "%" not in once:
        assert fn.normalize_url_py(once) == once


@given(url_text)
@settings(max_examples=300, deadline=None)
def test_normalize_url_shape(raw):
    out = fn.normalize_url_py(raw)
    if out.startswith(("http://", "https://")):
        assert not out.endswith("/")
        # percent-quoted output is ASCII-safe
        assert all(c.isalnum() or c in ":/?=&%._~-!$'()*+,;@[]" for c in out), out


any_text = st.text(max_size=200)


@given(any_text)
@settings(max_examples=300, deadline=None)
def test_parser_total_and_well_typed(resp):
    """The F2 parser never raises and always returns its contract shape."""
    cat, sug, kws = fn.parse_category_and_keywords_py(resp)
    assert isinstance(cat, str) and isinstance(sug, str)
    assert isinstance(kws, list) and 1 <= len(kws) <= fn.MAX_KEYWORDS
    assert all(isinstance(k, str) for k in kws)
    assert cat == fn.UNCATEGORIZED_APP or cat in fn.CATEGORY_ALLOWLIST


@given(st.lists(st.sampled_from(fn.CATEGORY_ALLOWLIST), min_size=1, max_size=3))
@settings(max_examples=50, deadline=None)
def test_parser_allowlist_categories_always_recognized(cats):
    resp = f"Category: {cats[0]} Keywords: alpha, beta."
    cat, sug, _ = fn.parse_category_and_keywords_py(resp)
    assert cat in fn.CATEGORY_ALLOWLIST
    assert sug != ""


@given(st.text(alphabet="ab ,", max_size=60))
@settings(max_examples=200, deadline=None)
def test_parser_keyword_cap(junk):
    _, _, kws = fn.parse_category_and_keywords_py(
        f"Category: Quantum Keywords: {junk}."
    )
    assert len(kws) <= fn.MAX_KEYWORDS


@given(any_text)
@settings(max_examples=200, deadline=None)
def test_fenced_json_parse_never_raises(text):
    out = fn.parse_fenced_json_py(text, ("a",))
    assert out is None or isinstance(out, dict)


# --- PNG codec: hypothesis round-trip (pure Python, no Spark) ----------

import numpy as np
from hypothesis import HealthCheck


@given(
    st.integers(min_value=1, max_value=12),   # height
    st.integers(min_value=1, max_value=12),   # width
    st.sampled_from([1, 2, 3, 4]),            # channels
    st.sampled_from([0, 1, 2, 3, 4]),         # filter type
    st.integers(min_value=0, max_value=2**31 - 1),  # pixel seed
)
@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_png_roundtrip_property(h, w, ch, ftype, seed):
    from webpagesgraphdatabase_spark.operators import png

    rng = np.random.RandomState(seed)
    pixels = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    blob = png.encode(pixels, filter_type=ftype)
    rw, rh, rch, out = png.decode(blob)
    assert (rw, rh, rch) == (w, h, ch)
    assert np.array_equal(out, pixels)
    assert png.parse_ihdr(blob) == (w, h, ch)


@given(st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_png_is_png_never_accepts_non_signature(blob):
    from webpagesgraphdatabase_spark.operators import png

    if not blob.startswith(png.PNG_SIGNATURE):
        assert not png.is_png(blob)


# --- WordPiece segmentation invariants (pure Python core) --------------

_WP_VOCAB = frozenset(["a", "b", "ab", "##a", "##b", "##ab", "cd", "##cd"])


@given(st.text(alphabet="ab", min_size=0, max_size=20))
@settings(max_examples=300, deadline=None)
def test_wordpiece_covers_word_exactly(word):
    from webpagesgraphdatabase_spark.operators.tokenize import segment_wordpiece

    pieces = segment_wordpiece(word, _WP_VOCAB)
    if pieces == ["[UNK]"]:
        return
    # pieces reassemble the word: strip ## continuations and concat
    rebuilt = "".join(p[2:] if p.startswith("##") else p for p in pieces)
    assert rebuilt == word
    # only the first piece lacks the continuation prefix
    assert all(p.startswith("##") for p in pieces[1:])
    if pieces:
        assert not pieces[0].startswith("##")


# --- BPE merge invariants (pure Python core) ---------------------------

_BPE_RANKS = {("a", "b"): 0, ("ab", "a"): 1, ("b", "a"): 2, ("ab", "ab"): 3}


@given(st.text(alphabet="ab", min_size=0, max_size=20))
@settings(max_examples=300, deadline=None)
def test_bpe_tokens_always_reassemble_word(word):
    """BPE has no UNK: whatever the merges table, the output pieces
    concatenate back to the input exactly, and no adjacent output pair
    is still ranked (the loop ran to fixpoint)."""
    from webpagesgraphdatabase_spark.operators.tokenize import merge_word_bpe

    pieces = merge_word_bpe(word, _BPE_RANKS)
    assert "".join(pieces) == word
    assert all((x, y) not in _BPE_RANKS for x, y in zip(pieces, pieces[1:]))


# ---------------------------------------------------------------------------
# r5 second-wave pure cores: segment math, merges wire format, BPE
# trainer's merge-application lambda semantics, media header parsers
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=4),
        min_size=0,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=200, deadline=None)
def test_chunk_segmentation_partitions_tokens(tokens, k):
    """The fixed-k chunking is a partition of the token list: segments
    concatenate back to the tokens, every segment but the last has
    exactly k tokens, none is empty."""
    import math

    n = len(tokens)
    n_segs = math.ceil(n / k)
    segs = [" ".join(tokens[i * k : (i + 1) * k]) for i in range(n_segs)]
    # the pure-python model of operators/dedup.segment_array (chunk)
    assert " ".join(segs).split() == tokens
    for s in segs[:-1]:
        assert len(s.split()) == k
    assert all(s for s in segs)


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="ab#", min_size=1, max_size=5),
            st.text(alphabet="ab#", min_size=1, max_size=5),
        ),
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_merges_txt_roundtrip_any_table(pairs):
    from webpagesgraphdatabase_spark.operators import tokenize

    # merges.txt is space-separated: symbols with spaces are unserializable
    txt = tokenize.merges_to_text(pairs)
    assert tokenize.merges_from_text(txt) == pairs


@given(
    st.lists(st.text(alphabet="xyz", min_size=1, max_size=2), min_size=1, max_size=12),
    st.text(alphabet="xyz", min_size=1, max_size=2),
    st.text(alphabet="xyz", min_size=1, max_size=2),
)
@settings(max_examples=300, deadline=None)
def test_single_pass_merge_lambda_semantics(parts, pa, pb):
    """The trainer's accumulate-or-fuse rule (train_bpe_merges' codegen
    lambda) must equal merge_word_bpe's explicit single left-to-right
    non-overlapping pass, for ANY symbol sequence and pair."""
    from webpagesgraphdatabase_spark.operators.tokenize import merge_word_bpe

    # reference: one pass of merge_word_bpe restricted to exactly this pair
    want = []
    i = 0
    while i < len(parts):
        if i + 1 < len(parts) and (parts[i], parts[i + 1]) == (pa, pb):
            want.append(pa + pb)
            i += 2
        else:
            want.append(parts[i])
            i += 1
    # the lambda: append, or fuse with the accumulator's tail
    acc = []
    for x in parts:
        if acc and acc[-1] == pa and x == pb:
            acc[-1] = pa + pb
        else:
            acc.append(x)
    # NOTE: the lambda re-fuses only if acc[-1] == pa; a fused token
    # equals pa+pb != pa (pb nonempty), so the two passes agree
    assert acc == want
    # cross-check against the full greedy merge with this single rank
    assert merge_word_bpe("".join(parts), {(pa, pb): 0}) is not None


@given(
    st.integers(min_value=1, max_value=0xFFFFF),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=4, max_value=32),
    st.integers(min_value=0, max_value=2**36 - 1),
)
@settings(max_examples=200, deadline=None)
def test_flac_header_roundtrip_any_params(rate, ch, bps, n):
    from webpagesgraphdatabase_spark.operators import mediainfo as mi

    si = mi.parse_flac_streaminfo(mi.encode_flac_header(rate, ch, bps, n))
    assert si == {
        "sample_rate": rate,
        "channels": ch,
        "bits_per_sample": bps,
        "n_samples": n,
    }


@given(
    st.integers(min_value=0, max_value=10**7),
    st.integers(min_value=1, max_value=65535),
    st.integers(min_value=1, max_value=65535),
)
@settings(max_examples=200, deadline=None)
def test_mp4_header_roundtrip_any_params(dur, w, h):
    from webpagesgraphdatabase_spark.operators import mediainfo as mi

    out = mi.parse_mp4(mi.encode_mp4_header(dur, w, h))
    assert out == {"duration_ms": dur, "width": w, "height": h}


_SEG = st.sampled_from(["a", "bb", "page", "x1", "img2"])


@st.composite
def _base_url(draw):
    segs = draw(st.lists(_SEG, min_size=0, max_size=3))
    leaf = draw(st.sampled_from(["", "index.html", "p.php"]))
    return "https://host.example/" + "/".join(segs) + ("/" if segs else "") + leaf


@st.composite
def _href(draw):
    kind = draw(st.sampled_from(["abs", "proto", "root", "rel", "dotrel"]))
    segs = draw(st.lists(_SEG, min_size=1, max_size=3))
    path = "/".join(segs)
    if kind == "abs":
        return "https://other.example/" + path
    if kind == "proto":
        return "//cdn.example/" + path
    if kind == "root":
        return "/" + path
    if kind == "dotrel":
        ups = draw(st.integers(min_value=1, max_value=3))
        return "../" * ups + path
    return path


@given(_base_url(), _href())
@settings(max_examples=500, deadline=None)
def test_resolve_href_matches_stdlib_urljoin(base, href):
    """RFC 3986 reference resolution: the codegen chain's driver twin
    agrees with urllib.parse.urljoin on the supported href classes
    (absolute, protocol-relative, root-relative, relative, ../-chains
    within the bounded depth)."""
    from urllib.parse import urljoin

    from webpagesgraphdatabase_spark.functions import html as H

    assert H.resolve_href_py(base, href) == urljoin(base, href)


# --- WARC container round-trip (r8) ---------------------------------------

_warc_rec = st.fixed_dictionaries(
    {
        "record_id": st.text(
            alphabet=st.characters(
                codec="ascii", exclude_characters="\r\n", min_codepoint=33
            ),
            min_size=1,
            max_size=40,
        ),
        "warc_type": st.sampled_from(
            ["response", "conversion", "revisit", "warcinfo", "request"]
        ),
        "target_uri": st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    codec="ascii", exclude_characters="\r\n", min_codepoint=33
                ),
                min_size=1,
                max_size=60,
            ),
        ),
        "content_type": st.sampled_from(
            ["text/plain", "application/http; msgtype=response", "image/gif"]
        ),
        "block": st.binary(max_size=300),
    }
)


@given(
    recs=st.lists(_warc_rec, min_size=1, max_size=6),
    compress=st.sampled_from(["none", "file", "record"]),
)
@settings(max_examples=60, deadline=None)
def test_warc_container_roundtrip_property(recs, compress):
    """build_warc → iter_warc_records recovers EVERY record's id,
    type, target and exact block bytes, under every compression mode,
    for arbitrary binary blocks (incl. bytes that look like CRLFs or
    WARC headers — Content-Length framing must never resynchronize on
    block content)."""
    from webpagesgraphdatabase_spark import warc as W

    buf = W.build_warc(recs, compress=compress)
    got = list(W.iter_warc_records(buf))
    assert len(got) == len(recs)
    for want, rec in zip(recs, got):
        assert rec["record_id"] == want["record_id"]
        assert rec["warc_type"] == want["warc_type"]
        assert rec["target_uri"] == (want["target_uri"] or None)
        assert rec["block"] == want["block"]
        assert rec["content_length"] == len(want["block"])


@given(
    status=st.integers(min_value=100, max_value=599),
    ctype=st.sampled_from(
        ["text/html", "text/html; charset=utf-8", "application/json"]
    ),
    body=st.binary(max_size=300),
)
@settings(max_examples=60, deadline=None)
def test_http_payload_roundtrip_property(status, ctype, body):
    """http_response_block → parse_http_payload recovers status, the
    base content type, and the exact body bytes — even when the body
    itself contains CRLFCRLF (the head/body split must bind to the
    FIRST blank line, never resynchronize inside the body)."""
    from webpagesgraphdatabase_spark import warc as W

    block = W.http_response_block(body, status=status, content_type=ctype)
    got_status, got_ctype, got_body = W.parse_http_payload(block)
    assert got_status == status
    assert got_ctype == ctype
    assert got_body == body
