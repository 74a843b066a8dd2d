"""Embedder forward-parity fixtures (VERDICT round-2 item 3).

``bert_forward`` must reproduce the reference's Candle BERT math
(reference: src/embeddings.rs:144-182): post-LN BERT encoder with exact
(erf) GELU, LayerNorm eps 1e-12, additive padding mask, CLS pooling,
then L2 normalization. ``tests/test_embed.py`` already pins *weight
mapping*; these tests pin the *forward math* against two independent
implementations:

1. a from-scratch float64 numpy BERT forward written from the published
   BERT equations (not from ``minilm.py``), and
2. ``transformers.BertModel`` (the canonical implementation Candle
   mirrors) fed the same weights, when torch+transformers are available.

A GELU-variant swap (tanh vs erf), a LayerNorm-eps drift, a mask-scale
bug, or a pooling change all produce diffs far above the asserted
tolerances.
"""

import math

import numpy as np
import pytest

from vectorlite_tpu.embed.minilm import (
    MiniLMEmbedder,
    _random_params,
    bert_forward,
)

import jax.numpy as jnp

SMALL_CONFIG = {
    "hidden_size": 64,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "intermediate_size": 128,
    "vocab_size": 1000,
    "max_position_embeddings": 64,
}


# ----------------------------------------------------- independent f64 BERT


def _erf_vec(x):
    return np.vectorize(math.erf)(x)


def _np_gelu_exact(x):
    # exact GELU: x * Phi(x); the reference's Candle uses erf-GELU, NOT
    # the tanh approximation
    return 0.5 * x * (1.0 + _erf_vec(x / math.sqrt(2.0)))


def _np_layer_norm(x, w, b, eps=1e-12):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _np_softmax(x):
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)


def np_bert_forward(params, input_ids, attention_mask, config):
    """Textbook float64 BERT encoder forward (post-LN, as in the original
    BERT and HF/Candle bert-*): written independently from the published
    equations for parity checking."""
    p = {
        k: np.asarray(v, np.float64)
        for k, v in params.items()
        if k != "layers"
    }
    layers = [
        {k: np.asarray(v, np.float64) for k, v in layer.items()}
        for layer in params["layers"]
    ]
    ids = np.asarray(input_ids)
    B, L = ids.shape
    H = config["hidden_size"]
    n_heads = config["num_attention_heads"]
    head = H // n_heads

    h = (
        p["word_emb"][ids]
        + p["pos_emb"][None, :L]
        + p["type_emb"][0][None, None, :]
    )
    h = _np_layer_norm(h, p["emb_ln_w"], p["emb_ln_b"])

    add_mask = (1.0 - np.asarray(attention_mask, np.float64)) * -1e9
    add_mask = add_mask[:, None, None, :]  # [B, 1, 1, L]

    for lp in layers:
        q = h @ lp["q_w"] + lp["q_b"]
        k = h @ lp["k_w"] + lp["k_b"]
        v = h @ lp["v_w"] + lp["v_b"]
        q = q.reshape(B, L, n_heads, head).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, n_heads, head).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, n_heads, head).transpose(0, 2, 1, 3)
        scores = q @ k.transpose(0, 1, 3, 2) / math.sqrt(head) + add_mask
        ctx = _np_softmax(scores) @ v
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, H)
        h = _np_layer_norm(
            h + ctx @ lp["ao_w"] + lp["ao_b"], lp["ao_ln_w"], lp["ao_ln_b"]
        )
        ffn = _np_gelu_exact(h @ lp["i_w"] + lp["i_b"])
        h = _np_layer_norm(
            h + ffn @ lp["o_w"] + lp["o_b"], lp["o_ln_w"], lp["o_ln_b"]
        )
    return h


def _mk_inputs(config, seed=3):
    rng = np.random.default_rng(seed)
    B, L = 4, 12
    ids = rng.integers(0, config["vocab_size"], (B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    # ragged padding: rows 1..3 have trailing pad tokens
    for row, real in enumerate((L, 9, 5, 1)):
        ids[row, real:] = 0
        mask[row, real:] = 0
    return ids, mask


class TestForwardVsNumpyF64:
    def test_hidden_states_match(self):
        config = dict(SMALL_CONFIG)
        params = _random_params(config, seed=11)
        ids, mask = _mk_inputs(config)
        got = np.asarray(
            bert_forward(
                {
                    **{
                        k: jnp.asarray(v)
                        for k, v in params.items()
                        if k != "layers"
                    },
                    "layers": [
                        {k: jnp.asarray(v) for k, v in l.items()}
                        for l in params["layers"]
                    ],
                },
                jnp.asarray(ids),
                jnp.asarray(mask),
                config,
            ),
            np.float64,
        )
        want = np_bert_forward(params, ids, mask, config)
        # f32 forward vs f64 reference: error is pure accumulation noise.
        # A tanh-GELU swap measures ~1e-3 max diff; LN-eps 1e-5 vs 1e-12
        # measures ~1e-4 on low-variance rows — both far above this gate.
        assert np.max(np.abs(got - want)) < 5e-5
        # per-row: padded rows must match too (mask handling)
        for row in range(got.shape[0]):
            assert np.max(np.abs(got[row] - want[row])) < 5e-5

    def test_cls_embedding_pipeline_matches(self):
        """Full pipeline parity: CLS pooling + L2 norm (reference:
        src/embeddings.rs:163-181)."""
        config = dict(SMALL_CONFIG)
        emb = MiniLMEmbedder.random_init(seed=7, config=config)
        texts = ["hello world", "a much longer piece of text here", "x"]
        got = emb.embed_batch_arrays(texts).astype(np.float64)

        # reproduce via the numpy forward + explicit CLS/L2 steps
        params = _random_params(config, seed=7)
        from vectorlite_tpu.embed.minilm import tokenize_batch

        def _encode_one(t):
            i_a, m_a = tokenize_batch(emb._tokenizer, [t], 512)
            return i_a[0, : int(m_a[0].sum())].tolist()

        encs = [_encode_one(t) for t in texts]
        L = max(len(e) for e in encs)
        # mirror the bucket padding the embedder applies
        from vectorlite_tpu.embed.minilm import _LEN_BUCKETS

        L = next(b for b in _LEN_BUCKETS if b >= L)
        ids = np.zeros((len(texts), L), np.int32)
        mask = np.zeros((len(texts), L), np.int32)
        for i, e in enumerate(encs):
            ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
        hidden = np_bert_forward(params, ids, mask, config)
        cls = hidden[:, 0, :]
        want = cls / np.linalg.norm(cls, axis=-1, keepdims=True)
        assert np.max(np.abs(got - want)) < 5e-5

    def test_layer_norm_eps_is_1e12_sensitive_case(self):
        """Tiny-variance inputs: eps=1e-5 would diverge by O(1) here."""
        from vectorlite_tpu.embed.minilm import _layer_norm

        x = np.full((1, 8), 3.0) + np.linspace(0, 1e-4, 8)
        w = np.ones(8)
        b = np.zeros(8)
        got = np.asarray(
            _layer_norm(jnp.asarray(x, jnp.float32), w, b), np.float64
        )
        want = _np_layer_norm(x, w, b, eps=1e-12)
        wrong_eps = _np_layer_norm(x, w, b, eps=1e-5)
        assert np.max(np.abs(got - want)) < 2e-2  # f32 noise at var~1e-9
        assert np.max(np.abs(want - wrong_eps)) > 0.5  # the gate matters


class TestForwardVsTorchHF:
    """Cross-check against transformers.BertModel — the canonical
    implementation the reference's Candle BERT mirrors."""

    @pytest.fixture(scope="class")
    def torch_setup(self):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        return torch, transformers

    def test_forward_matches_bertmodel(self, torch_setup):
        torch, transformers = torch_setup
        config = dict(SMALL_CONFIG)
        params = _random_params(config, seed=23)

        hf_config = transformers.BertConfig(
            vocab_size=config["vocab_size"],
            hidden_size=config["hidden_size"],
            num_hidden_layers=config["num_hidden_layers"],
            num_attention_heads=config["num_attention_heads"],
            intermediate_size=config["intermediate_size"],
            max_position_embeddings=config["max_position_embeddings"],
            hidden_act="gelu",  # exact erf-GELU in HF
            layer_norm_eps=1e-12,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        model = transformers.BertModel(hf_config, add_pooling_layer=False)

        # our flat pytree -> HF state dict (torch Linear stores [out, in])
        def t(x):
            return torch.from_numpy(np.ascontiguousarray(x))

        state = {
            "embeddings.word_embeddings.weight": t(params["word_emb"]),
            "embeddings.position_embeddings.weight": t(params["pos_emb"]),
            "embeddings.token_type_embeddings.weight": t(params["type_emb"]),
            "embeddings.LayerNorm.weight": t(params["emb_ln_w"]),
            "embeddings.LayerNorm.bias": t(params["emb_ln_b"]),
        }
        for i, lp in enumerate(params["layers"]):
            pre = f"encoder.layer.{i}."
            state.update(
                {
                    pre + "attention.self.query.weight": t(lp["q_w"].T),
                    pre + "attention.self.query.bias": t(lp["q_b"]),
                    pre + "attention.self.key.weight": t(lp["k_w"].T),
                    pre + "attention.self.key.bias": t(lp["k_b"]),
                    pre + "attention.self.value.weight": t(lp["v_w"].T),
                    pre + "attention.self.value.bias": t(lp["v_b"]),
                    pre + "attention.output.dense.weight": t(lp["ao_w"].T),
                    pre + "attention.output.dense.bias": t(lp["ao_b"]),
                    pre + "attention.output.LayerNorm.weight": t(
                        lp["ao_ln_w"]
                    ),
                    pre + "attention.output.LayerNorm.bias": t(lp["ao_ln_b"]),
                    pre + "intermediate.dense.weight": t(lp["i_w"].T),
                    pre + "intermediate.dense.bias": t(lp["i_b"]),
                    pre + "output.dense.weight": t(lp["o_w"].T),
                    pre + "output.dense.bias": t(lp["o_b"]),
                    pre + "output.LayerNorm.weight": t(lp["o_ln_w"]),
                    pre + "output.LayerNorm.bias": t(lp["o_ln_b"]),
                }
            )
        missing, unexpected = model.load_state_dict(state, strict=False)
        # position_ids buffer may be "missing" on newer transformers;
        # nothing learnable may be missing
        assert not [m for m in missing if "position_ids" not in m]
        assert not unexpected
        model.eval()

        ids, mask = _mk_inputs(config, seed=5)
        with torch.no_grad():
            want = model(
                input_ids=torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
            ).last_hidden_state.numpy()

        got = np.asarray(
            bert_forward(
                {
                    **{
                        k: jnp.asarray(v)
                        for k, v in params.items()
                        if k != "layers"
                    },
                    "layers": [
                        {k: jnp.asarray(v) for k, v in l.items()}
                        for l in params["layers"]
                    ],
                },
                jnp.asarray(ids),
                jnp.asarray(mask),
                config,
            )
        )
        # both are f32 forwards of identical weights; only the padded
        # positions of padded rows may differ (HF computes them, we mask
        # the same way — compare real tokens only)
        for row in range(got.shape[0]):
            real = int(mask[row].sum())
            assert (
                np.max(np.abs(got[row, :real] - want[row, :real])) < 2e-5
            )
