"""vectorlite-tpu — a TPU-native in-memory vector search engine.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the Rust
VectorLite reference (crate root re-exports: reference src/lib.rs:124-137):
exact flat search as MXU matmul + fused top-k over HBM-resident vector
matrices, HNSW over flat adjacency arrays with batched beam search,
on-device MiniLM embeddings, byte-compatible ``.vlc`` persistence, and the
same HTTP/SDK surface.
"""

from .core.types import DEFAULT_VECTOR_DIMENSION, SearchResult, Vector
from .core.metrics import (
    SimilarityMetric,
    cosine_similarity,
    dot_product,
    euclidean_similarity,
    manhattan_similarity,
)
from .errors import VectorLiteError
from .index.flat import FlatIndex
from .index.hnsw import HNSWIndex
from .embed.base import EmbeddingFunction
from .embed.mock import ConstantEmbeddingFunction, MockEmbeddingFunction
from .store.client import IndexType, Settings, VectorLiteClient
from .store.collection import Collection, CollectionInfo
from .persist.vlc import (
    load_collection_from_file,
    save_collection_to_file,
)
from .config import VectorLiteConfig
from .errors import FileNotFound, InvalidFilter, PersistenceError

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy re-exports mirroring the reference crate root
    # (reference: src/lib.rs:131-137) without importing the HTTP stack or
    # the embedder at package-import time.
    if name in ("create_app", "start_server"):
        from .api import server

        return getattr(server, name)
    if name == "EmbeddingGenerator":
        # reference name for the built-in model embedder
        from .embed.minilm import MiniLMEmbedder

        return MiniLMEmbedder
    if name == "MiniLMEmbedder":
        from .embed.minilm import MiniLMEmbedder

        return MiniLMEmbedder
    if name in ("RemoteClient", "RemoteError", "RemoteConnectionError"):
        from . import remote

        return getattr(remote, name)
    raise AttributeError(f"module 'vectorlite_tpu' has no attribute {name!r}")

__all__ = [
    "DEFAULT_VECTOR_DIMENSION",
    "Vector",
    "SearchResult",
    "SimilarityMetric",
    "cosine_similarity",
    "euclidean_similarity",
    "manhattan_similarity",
    "dot_product",
    "VectorLiteError",
    "FlatIndex",
    "HNSWIndex",
    "EmbeddingFunction",
    "MockEmbeddingFunction",
    "ConstantEmbeddingFunction",
    "VectorLiteClient",
    "Collection",
    "CollectionInfo",
    "IndexType",
    "Settings",
    "VectorLiteConfig",
    "PersistenceError",
    "FileNotFound",
    "InvalidFilter",
    "create_app",
    "start_server",
    "RemoteClient",
    "RemoteError",
    "RemoteConnectionError",
    "EmbeddingGenerator",
    "MiniLMEmbedder",
    "save_collection_to_file",
    "load_collection_from_file",
]
