"""Embedder tests (mirrors reference: src/embeddings.rs:344-427)."""

import numpy as np
import pytest

from vectorlite_tpu import MockEmbeddingFunction, SimilarityMetric
from vectorlite_tpu.embed.minilm import MiniLMEmbedder


@pytest.fixture(scope="module")
def minilm():
    # tiny config keeps CPU compile fast while exercising the full stack
    config = {
        "hidden_size": 64,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "intermediate_size": 128,
        "vocab_size": 1000,
        "max_position_embeddings": 128,
    }
    return MiniLMEmbedder.random_init(seed=0, config=config)


class TestMockEmbedder:
    def test_dimension(self):
        assert MockEmbeddingFunction().dimension == 384

    def test_shape_and_nonzero(self):
        emb = MockEmbeddingFunction().generate_embedding(
            "hello world this is a test"
        )
        assert len(emb) == 384
        assert any(x != 0.0 for x in emb)

    def test_deterministic(self):
        gen = MockEmbeddingFunction()
        a = gen.generate_embedding("the quick brown fox")
        b = gen.generate_embedding("the quick brown fox")
        assert a == b

    def test_l2_normalized(self):
        emb = MockEmbeddingFunction().generate_embedding("test normalization")
        norm = float(np.sqrt(np.dot(emb, emb)))
        assert abs(norm - 1.0) < 1e-10

    def test_different_texts_differ(self):
        gen = MockEmbeddingFunction()
        a = gen.generate_embedding("hello world")
        b = gen.generate_embedding("goodbye universe")
        assert SimilarityMetric.COSINE.calculate(a, b) < 0.99

    def test_batch(self):
        gen = MockEmbeddingFunction()
        out = gen.embed_batch(["first text", "second text", "third text"])
        assert len(out) == 3
        assert all(len(e) == 384 for e in out)

    def test_empty_text(self):
        emb = MockEmbeddingFunction().generate_embedding("")
        assert len(emb) == 384


class TestMiniLMComputePath:
    def test_dimension(self, minilm):
        assert minilm.dimension == 64

    def test_embedding_shape_and_norm(self, minilm):
        emb = minilm.generate_embedding("hello world")
        assert len(emb) == 64
        norm = float(np.sqrt(np.dot(emb, emb)))
        assert abs(norm - 1.0) < 1e-5  # CLS pool + L2 norm

    def test_deterministic(self, minilm):
        a = minilm.generate_embedding("the quick brown fox")
        b = minilm.generate_embedding("the quick brown fox")
        np.testing.assert_allclose(a, b, atol=0)

    def test_batch_matches_single(self, minilm):
        texts = ["alpha beta", "gamma delta epsilon", "zeta"]
        batch = minilm.embed_batch(texts)
        # same length bucket => identical padding => identical activations
        singles = [minilm.generate_embedding(t) for t in texts]
        for b, s in zip(batch, singles):
            np.testing.assert_allclose(b, s, atol=1e-5)

    def test_different_texts_differ(self, minilm):
        # random weights give highly similar CLS outputs; only require
        # that different token ids actually change the activations
        a = minilm.generate_embedding("hello world")
        b = minilm.generate_embedding("completely different text")
        assert a != b

    def test_attention_mask_isolates_padding(self, minilm):
        # a text's embedding must not depend on batch-mates' lengths
        a_alone = minilm.embed_batch(["short"])[0]
        a_padded = minilm.embed_batch(
            ["short", "a much longer text with many more tokens here"]
        )[0]
        np.testing.assert_allclose(a_alone, a_padded, atol=1e-4)

    def test_missing_model_dir_raises(self, tmp_path):
        from vectorlite_tpu.errors import EmbeddingError

        with pytest.raises(EmbeddingError) as ei:
            MiniLMEmbedder.from_pretrained(str(tmp_path / "nope"))
        assert "Tokenizer file not found" in str(ei.value)

    def test_hf_weight_mapping_shapes(self, minilm):
        # synthesize an HF-style state dict and verify the mapper
        from vectorlite_tpu.embed.minilm import (
            _map_hf_params,
            _random_params,
        )

        config = minilm._config
        h = config["hidden_size"]
        inter = config["intermediate_size"]
        rng = np.random.default_rng(0)
        state = {
            "embeddings.word_embeddings.weight": rng.normal(
                size=(config["vocab_size"], h)
            ),
            "embeddings.position_embeddings.weight": rng.normal(
                size=(config["max_position_embeddings"], h)
            ),
            "embeddings.token_type_embeddings.weight": rng.normal(
                size=(2, h)
            ),
            "embeddings.LayerNorm.weight": np.ones(h),
            "embeddings.LayerNorm.bias": np.zeros(h),
        }
        for i in range(config["num_hidden_layers"]):
            p = f"encoder.layer.{i}."
            for nm, shp in [
                ("attention.self.query", (h, h)),
                ("attention.self.key", (h, h)),
                ("attention.self.value", (h, h)),
                ("attention.output.dense", (h, h)),
                ("intermediate.dense", (inter, h)),
                ("output.dense", (h, inter)),
            ]:
                state[p + nm + ".weight"] = rng.normal(size=shp)
                state[p + nm + ".bias"] = np.zeros(shp[0])
            for nm in ("attention.output.LayerNorm", "output.LayerNorm"):
                state[p + nm + ".weight"] = np.ones(h)
                state[p + nm + ".bias"] = np.zeros(h)
        params = _map_hf_params(state, config["num_hidden_layers"])
        ref = _random_params(config)
        for key in ("word_emb", "pos_emb", "type_emb"):
            assert params[key].shape == ref[key].shape
        for got, want in zip(params["layers"], ref["layers"]):
            for k in want:
                assert got[k].shape == want[k].shape, k


class TestPretrainedLoadPath:
    """End-to-end from_pretrained: write a real torch state dict + a
    minimal WordPiece tokenizer.json to disk, load through the same path
    the reference's model layout uses, and compare outputs against the
    directly-constructed encoder."""

    def test_torch_state_dict_roundtrip(self, tmp_path, minilm):
        import json

        import numpy as np
        import torch

        from vectorlite_tpu.embed.minilm import MiniLMEmbedder

        config = dict(minilm._config)
        params = minilm._params

        # inverse of _map_hf_params: our pytree -> HF-named state dict
        state = {
            "embeddings.word_embeddings.weight": params["word_emb"],
            "embeddings.position_embeddings.weight": params["pos_emb"],
            "embeddings.token_type_embeddings.weight": params["type_emb"],
            "embeddings.LayerNorm.weight": params["emb_ln_w"],
            "embeddings.LayerNorm.bias": params["emb_ln_b"],
        }
        pairs = [
            ("attention.self.query", "q_w", "q_b"),
            ("attention.self.key", "k_w", "k_b"),
            ("attention.self.value", "v_w", "v_b"),
            ("attention.output.dense", "ao_w", "ao_b"),
            ("intermediate.dense", "i_w", "i_b"),
            ("output.dense", "o_w", "o_b"),
        ]
        for i, layer in enumerate(params["layers"]):
            p = f"encoder.layer.{i}."
            for hf, w, b in pairs:
                state[p + hf + ".weight"] = np.asarray(layer[w]).T
                state[p + hf + ".bias"] = np.asarray(layer[b])
            state[p + "attention.output.LayerNorm.weight"] = layer["ao_ln_w"]
            state[p + "attention.output.LayerNorm.bias"] = layer["ao_ln_b"]
            state[p + "output.LayerNorm.weight"] = layer["o_ln_w"]
            state[p + "output.LayerNorm.bias"] = layer["o_ln_b"]
        torch_state = {
            k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
            for k, v in state.items()
        }
        model_dir = tmp_path / "model"
        model_dir.mkdir()
        torch.save(torch_state, model_dir / "pytorch_model.bin")
        (model_dir / "config.json").write_text(json.dumps(config))

        vocab = {"[UNK]": 0, "[CLS]": 101, "[SEP]": 102}
        for i, word in enumerate(["hello", "world", "vector", "search"]):
            vocab[word] = 200 + i
        tokenizer_json = {
            "version": "1.0",
            "truncation": None,
            "padding": None,
            "added_tokens": [],
            "normalizer": {"type": "Lowercase"},
            "pre_tokenizer": {"type": "Whitespace"},
            "post_processor": {
                "type": "TemplateProcessing",
                "single": [
                    {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
                    {"Sequence": {"id": "A", "type_id": 0}},
                    {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
                ],
                "pair": [
                    {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
                    {"Sequence": {"id": "A", "type_id": 0}},
                    {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
                    {"Sequence": {"id": "B", "type_id": 1}},
                ],
                "special_tokens": {
                    "[CLS]": {"id": "[CLS]", "ids": [101], "tokens": ["[CLS]"]},
                    "[SEP]": {"id": "[SEP]", "ids": [102], "tokens": ["[SEP]"]},
                },
            },
            "decoder": None,
            "model": {
                "type": "WordPiece",
                "unk_token": "[UNK]",
                "continuing_subword_prefix": "##",
                "max_input_chars_per_word": 100,
                "vocab": vocab,
            },
        }
        (model_dir / "tokenizer.json").write_text(json.dumps(tokenizer_json))

        loaded = MiniLMEmbedder.from_pretrained(str(model_dir))
        assert loaded.dimension == config["hidden_size"]
        emb = loaded.generate_embedding("hello world")
        assert len(emb) == config["hidden_size"]
        norm = float(np.sqrt(np.dot(emb, emb)))
        assert abs(norm - 1.0) < 1e-5

        # identical params + identical token ids => identical embedding
        from vectorlite_tpu.embed.minilm import tokenize_batch

        ids_a, mask_a = tokenize_batch(
            loaded._tokenizer, ["hello world"], 512
        )
        ids = ids_a[0, : int(mask_a[0].sum())].tolist()
        assert ids[0] == 101 and ids[-1] == 102  # CLS ... SEP
        from vectorlite_tpu.embed.minilm import _embed_step
        import jax.numpy as jnp

        direct = _embed_step(
            minilm._params,
            jnp.asarray(np.array([ids + [0] * (16 - len(ids))], np.int32)),
            jnp.asarray(
                np.array([[1] * len(ids) + [0] * (16 - len(ids))], np.int32)
            ),
            config_key=minilm._config_key,
        )
        np.testing.assert_allclose(
            np.asarray(direct)[0], np.asarray(emb), atol=1e-5
        )
