"""Config profiles (runtime analogue of the reference's Cargo features,
reference: Cargo.toml:15-22, src/index/hnsw.rs:95-109)."""

import jax.numpy as jnp
import pytest

from vectorlite_tpu import (
    IndexType,
    MockEmbeddingFunction,
    SimilarityMetric,
    VectorLiteClient,
    VectorLiteConfig,
)


class TestProfiles:
    def test_default(self):
        cfg = VectorLiteConfig.profile("default")
        assert (cfg.hnsw_m, cfg.hnsw_m0) == (16, 32)
        # "auto": f32, switching the flat cache to bf16 + exact rescore
        # only when f32 would bust the HBM budget (index/flat.py)
        assert cfg.device_dtype == "auto"

    def test_memory_optimized(self):
        cfg = VectorLiteConfig.profile("memory-optimized")
        assert (cfg.hnsw_m, cfg.hnsw_m0) == (8, 16)
        assert cfg.device_dtype == jnp.bfloat16

    def test_high_accuracy(self):
        cfg = VectorLiteConfig.profile("high-accuracy")
        assert (cfg.hnsw_m, cfg.hnsw_m0) == (32, 64)

    def test_unknown_profile(self):
        with pytest.raises(ValueError):
            VectorLiteConfig.profile("turbo")

    def test_env_selection(self, monkeypatch):
        monkeypatch.setenv("VECTORLITE_PROFILE", "memory-optimized")
        monkeypatch.setenv("VECTORLITE_EF_SEARCH", "128")
        cfg = VectorLiteConfig.from_env()
        assert cfg.hnsw_m == 8
        assert cfg.hnsw_ef_search == 128

    def test_profile_flows_into_indexes(self):
        cfg = VectorLiteConfig.profile("memory-optimized")
        client = VectorLiteClient(
            MockEmbeddingFunction(dimension=8), config=cfg
        )
        client.create_collection("f", IndexType.FLAT)
        client.create_collection("h", IndexType.HNSW, SimilarityMetric.COSINE)
        with client.get_collection("f").index_read() as idx:
            assert idx._device_dtype == jnp.bfloat16
        with client.get_collection("h").index_read() as idx:
            assert idx.m == 8 and idx.m0 == 16

    def test_bf16_search_still_correct(self):
        cfg = VectorLiteConfig.profile("memory-optimized")
        client = VectorLiteClient(
            MockEmbeddingFunction(dimension=32), config=cfg
        )
        client.create_collection("f", IndexType.FLAT)
        for i in range(20):
            client.add_text_to_collection("f", f"doc number {i}")
        res = client.search_text_in_collection("f", "doc number 7", 1)
        assert res[0].text == "doc number 7"
        assert res[0].score > 0.98  # bf16 corpus, f32 accumulate
