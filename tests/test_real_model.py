"""Real-model activation harness (VERDICT round-3 gap #1): the moment a
model-equipped environment runs pytest, the tokenizer-loading path, the
HF weight mapping, length bucketing, and special-token placement are
exercised against the REAL all-MiniLM-L6-v2 artifacts.

Activation ladder (each rung skips cleanly when its files are absent):

* ``models/all-MiniLM-L6-v2/tokenizer.json`` present (fetchable with
  ``python -m vectorlite_tpu.tools fetch-model`` — tokenizer.json alone
  is ~700 KB): pinned token-id goldens (tests/golden/
  tokenizer_minilm.json) + full staging parity vs ``transformers``'
  tokenizer on a tricky-string battery, through the SAME
  ``tokenize_batch`` the serving path uses.
* weights (model.safetensors / pytorch_model.bin) present too:
  end-to-end embedding parity vs ``transformers.BertModel`` (CLS + L2,
  the reference's pooling — src/embeddings.rs:165-180) and a semantic
  cosine-ordering golden on known sentence pairs.

Without model files the suite stays green via skips — mirroring the
reference CI's mock-embeddings mode (.github/workflows/rust.yml:19-22).
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vectorlite_tpu.embed.minilm import (  # noqa: E402
    MiniLMEmbedder,
    tokenize_batch,
)

MODEL_DIR = Path(
    os.environ.get("VECTORLITE_MODEL_DIR", "models/all-MiniLM-L6-v2")
)
GOLDEN = Path(__file__).parent / "golden" / "tokenizer_minilm.json"

_tok_ready = (MODEL_DIR / "tokenizer.json").exists()
_weights_ready = _tok_ready and any(
    (MODEL_DIR / w).exists()
    for w in ("model.safetensors", "pytorch_model.bin")
) and (MODEL_DIR / "config.json").exists()

needs_tokenizer = pytest.mark.skipif(
    not _tok_ready,
    reason="real tokenizer.json not present — fetch with "
    "`python -m vectorlite_tpu.tools fetch-model`",
)
needs_weights = pytest.mark.skipif(
    not _weights_ready,
    reason="real model weights not present — fetch with "
    "`python -m vectorlite_tpu.tools fetch-model`",
)

# the tricky-string battery shared with scripts/gen_tokenizer_goldens.py
TRICKY = [
    "hello world",
    "Hello World",
    "",
    "The quick brown fox jumps over the lazy dog.",
    "unbelievably counterintuitive tokenization",
    "café résumé naïve",
    "中文分词测试",
    "emoji \U0001f680 test",
    "123 45.67 -8e9",
    "!!! ??? ... ,,,",
    "  leading and   multiple   spaces  ",
    "tab\tand\nnewline separated",
    "hyphen-ated co-operate e-mail",
    "ALLCAPS SHOUTING",
    "apostrophe's don't it's",
    "ümläuts Øresund Łódź",
    "word " * 600,  # > 512 tokens: SEP-preserving truncation
]


@pytest.fixture(scope="module")
def real_tokenizer():
    from tokenizers import Tokenizer

    return Tokenizer.from_file(str(MODEL_DIR / "tokenizer.json"))


@needs_tokenizer
def test_special_token_ids(real_tokenizer):
    want = json.loads(GOLDEN.read_text())["special_tokens"]
    for name, wid in want.items():
        assert real_tokenizer.token_to_id(name) == wid, name


@needs_tokenizer
def test_vocab_slice_matches_real_tokenizer(real_tokenizer):
    """The checked-in vocab slice is the ONE hand-authored surface the
    always-on golden derivation rests on (tests/test_wordpiece_ref.py);
    here every (token, id) pair is machine-verified against the real
    tokenizer.json (reference: src/embeddings.rs:149)."""
    data = json.loads(
        (GOLDEN.parent / "vocab_slice_minilm.json").read_text()
    )
    for token, wid in data["vocab"].items():
        assert real_tokenizer.token_to_id(token) == wid, token


@needs_tokenizer
def test_full_battery_regenerates_identically(real_tokenizer):
    """VERDICT r4 item 8: once the real tokenizer is present, the full
    tricky-string battery (scripts/gen_tokenizer_goldens.py's TRICKY)
    must regenerate id-for-id through BOTH the raw tokenizer and the
    serving path's tokenize_batch — and any battery case already in the
    goldens file must match byte-identically (a stale or hand-edited
    regeneration fails here, not silently)."""
    golden = json.loads(GOLDEN.read_text())
    on_disk = {c["text"]: c["ids"] for c in golden["cases"]}
    ids, mask = tokenize_batch(real_tokenizer, TRICKY, 512)
    for row, text in enumerate(TRICKY):
        n = int(mask[row].sum())
        got = ids[row, :n].tolist()
        raw = real_tokenizer.encode(text).ids
        sep = real_tokenizer.token_to_id("[SEP]")
        want = raw[:511] + [sep] if len(raw) > 512 else raw
        assert got == want, text[:40]
        if text in on_disk:
            assert got == on_disk[text], text[:40]


@needs_tokenizer
def test_pinned_token_id_goldens(real_tokenizer):
    """Checked-in fixtures through the production staging path."""
    cases = json.loads(GOLDEN.read_text())["cases"]
    texts = [c["text"] for c in cases]
    ids, mask = tokenize_batch(real_tokenizer, texts, 512)
    for row, case in enumerate(cases):
        n = int(mask[row].sum())
        assert ids[row, :n].tolist() == case["ids"], case["text"]
        assert not ids[row, n:].any()  # [PAD]=0 past the mask


@needs_tokenizer
def test_staging_parity_vs_transformers(real_tokenizer):
    """tokenize_batch must agree with transformers' own pipeline on
    the full battery: same ids, same mask, truncation keeps [SEP]."""
    transformers = pytest.importorskip("transformers")
    hf = transformers.PreTrainedTokenizerFast(
        tokenizer_file=str(MODEL_DIR / "tokenizer.json")
    )
    ids, mask = tokenize_batch(real_tokenizer, TRICKY, 512)
    for row, text in enumerate(TRICKY):
        want = hf(
            text,
            add_special_tokens=True,
            truncation=True,
            max_length=512,
        )["input_ids"]
        n = int(mask[row].sum())
        got = ids[row, :n].tolist()
        assert got == want, (text[:40], got[:8], want[:8])
        assert mask[row, :n].all() and not mask[row, n:].any()
    # length bucketing: the >512 row hit exactly the 512 cap with SEP
    long_row = TRICKY.index("word " * 600)
    n = int(mask[long_row].sum())
    sep = real_tokenizer.token_to_id("[SEP]")
    assert n == 512 and ids[long_row, n - 1] == sep


@pytest.fixture(scope="module")
def real_embedder():
    return MiniLMEmbedder.from_pretrained(str(MODEL_DIR))


@needs_weights
def test_embedding_parity_vs_transformers(real_embedder):
    """Full-stack parity: our jitted BERT forward + CLS + L2 vs
    transformers.BertModel on the real weights."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    texts = TRICKY[:8]
    ours = real_embedder.embed_batch_arrays(texts)
    assert ours.shape == (len(texts), 384)
    np.testing.assert_allclose(
        np.linalg.norm(ours, axis=1), 1.0, atol=1e-5
    )

    model = transformers.BertModel.from_pretrained(str(MODEL_DIR))
    model.eval()
    hf_tok = transformers.PreTrainedTokenizerFast(
        tokenizer_file=str(MODEL_DIR / "tokenizer.json")
    )
    hf_tok.pad_token = "[PAD]"
    enc = hf_tok(
        list(texts),
        padding=True,
        truncation=True,
        max_length=512,
        return_tensors="pt",
    )
    with torch.no_grad():
        hidden = model(
            input_ids=enc["input_ids"],
            attention_mask=enc["attention_mask"],
        ).last_hidden_state
    cls = hidden[:, 0].numpy()
    theirs = cls / np.linalg.norm(cls, axis=1, keepdims=True)
    # f32 forward on two different backends: agree to ~1e-4
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


@needs_weights
def test_semantic_cosine_golden(real_embedder):
    """Known-sentence similarity structure: related pairs must beat
    unrelated ones by a wide margin — a weight-mapping bug (layer
    permutation, transposed projection) collapses this instantly even
    when shapes line up."""
    texts = [
        "A cat is sitting on the mat.",
        "A kitten rests on a rug.",
        "The stock market fell sharply today.",
        "Quantum computers factor large numbers.",
    ]
    e = real_embedder.embed_batch_arrays(texts)
    sim = e @ e.T
    related = sim[0, 1]
    unrelated = max(sim[0, 2], sim[0, 3], sim[1, 2], sim[1, 3])
    assert related > 0.5, related
    assert related > unrelated + 0.2, (related, unrelated)
