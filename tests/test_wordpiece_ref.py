"""Always-on self-verification of the tokenizer goldens (VERDICT r4
item 8): every pinned id sequence in tests/golden/tokenizer_minilm.json
must be DERIVABLE from the checked-in vocab slice by the in-repo
WordPiece reference implementation — no hand-typed token id can
silently gate a parity claim. Plus behavioral tests of the reference
implementation itself (the normalization contract the real MiniLM
tokenizer.json encodes, reference: src/embeddings.rs:144-156).
"""

import json
from pathlib import Path

import pytest

from vectorlite_tpu.embed import wordpiece as wp

GOLDEN_DIR = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def slice_vocab():
    data = json.loads((GOLDEN_DIR / "vocab_slice_minilm.json").read_text())
    return data["vocab"]


@pytest.fixture(scope="module")
def goldens():
    return json.loads((GOLDEN_DIR / "tokenizer_minilm.json").read_text())


def test_special_token_pins_come_from_slice(slice_vocab, goldens):
    for name, wid in goldens["special_tokens"].items():
        assert slice_vocab[name] == wid, name


def test_every_pinned_case_derives_from_slice(slice_vocab, goldens):
    """The load-bearing check: pinned id sequences are re-derived from
    the single hand-authored surface (the slice) by the reference
    WordPiece pipeline. A typo in any per-case sequence fails here, in
    every environment, model files or not."""
    for case in goldens["cases"]:
        got = wp.encode(slice_vocab, case["text"])
        assert got == case["ids"], (case["text"], got, case["ids"])


def test_slice_covers_exactly_what_pins_need(slice_vocab, goldens):
    """Every token the pinned cases produce must be in the slice (else
    encode() would raise/UNK) — and derivation must not silently pass
    through [UNK] (a missing slice entry would otherwise masquerade as
    a legitimate unknown-token id)."""
    unk = slice_vocab["[UNK]"]
    for case in goldens["cases"]:
        assert unk not in wp.encode(slice_vocab, case["text"]), case["text"]


# --- behavioral contract of the reference implementation itself -----


def test_basic_tokenize_lowercases_and_splits_punct():
    assert wp.basic_tokenize("Hello, World.") == [
        "hello", ",", "world", ".",
    ]


def test_basic_tokenize_strips_accents_nfd():
    assert wp.basic_tokenize("café Résumé") == ["cafe", "resume"]


def test_basic_tokenize_isolates_cjk():
    assert wp.basic_tokenize("ab中文cd") == ["ab", "中", "文", "cd"]


def test_basic_tokenize_cleans_controls_and_whitespace():
    assert wp.basic_tokenize("a\tb\nc\x00d ​ e") == ["a", "b", "cd", "e"]


def test_wordpiece_greedy_longest_match():
    # canonical case: continuation pieces carry '##'
    vocab = {"un": 1, "##believ": 2, "##able": 3}
    assert wp.wordpiece_word(vocab, "unbelievable") == [
        "un", "##believ", "##able",
    ]
    # greedy is LONGEST-first, not first-fit, and does not backtrack:
    # "unb" beats "un", after which "##elievable" has no match -> UNK
    vocab2 = dict(vocab, unb=5)
    assert wp.wordpiece_word(vocab2, "unb") == ["unb"]
    assert wp.wordpiece_word(vocab2, "unbelievable") is None


def test_wordpiece_unmatchable_word_is_unk():
    vocab = {"[UNK]": 100, "a": 1}
    assert wp.tokenize(vocab, "axq") == ["[UNK]"]
    assert wp.wordpiece_word({"a": 1}, "b") is None


def test_wordpiece_long_token_is_unk():
    vocab = {"[UNK]": 100, "a": 1, "##a": 2}
    assert wp.tokenize(vocab, "a" * 101) == ["[UNK]"]


def test_encode_truncation_preserves_sep(slice_vocab):
    ids = wp.encode(slice_vocab, "hello world " * 600, max_length=512)
    assert len(ids) == 512
    assert ids[0] == slice_vocab["[CLS]"]
    assert ids[-1] == slice_vocab["[SEP]"]


def test_empty_text(slice_vocab):
    assert wp.encode(slice_vocab, "") == [
        slice_vocab["[CLS]"], slice_vocab["[SEP]"],
    ]
