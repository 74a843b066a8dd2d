"""VectorLiteClient — the collection registry and top-level SDK entry point.

Mirrors the reference ``VectorLiteClient`` (reference: src/client.rs:65-192):
a map of named collections plus a shared embedding function. Collection
dimension always comes from the embedder (reference: src/client.rs:88);
HNSW creation requires an explicit metric (reference: src/client.rs:96).
"""

from __future__ import annotations

import enum
from typing import Any, Optional

from ..core.metrics import SimilarityMetric
from ..core.types import SearchResult, Vector
from ..embed.base import EmbeddingFunction
from ..errors import (
    CollectionAlreadyExists,
    CollectionNotFound,
    InvalidIndexType,
    MetricRequired,
)
from ..index.flat import FlatIndex
from ..index.hnsw import HNSWIndex
from .collection import Collection, CollectionInfo


class IndexType(enum.Enum):
    """Reference: src/client.rs:217-232."""

    FLAT = "Flat"
    HNSW = "HNSW"

    @classmethod
    def parse(cls, s: str) -> "IndexType":
        """Case-insensitive parse (reference: src/server.rs:149-155)."""
        t = s.lower()
        if t == "flat":
            return cls.FLAT
        if t == "hnsw":
            return cls.HNSW
        raise InvalidIndexType(s)


class Settings:
    """Reserved for future configuration (reference: src/client.rs:73)."""


class VectorLiteClient:
    def __init__(self, embedding_function: EmbeddingFunction, *, config=None):
        from ..config import VectorLiteConfig

        self._collections: dict[str, Collection] = {}
        self._embedding_function = embedding_function
        self._config = config or VectorLiteConfig.from_env()
        self._mesh = None  # built lazily from config.mesh_devices
        self._observer = None  # see set_collection_observer

    def set_collection_observer(self, observer) -> None:
        """Register a lifecycle observer (e.g. ``wal.WalManager``):
        ``collection_registered(collection)`` fires after every
        registration (create, load, restore, add_collection) and
        ``collection_deleted(name)`` after removal. One observer slot;
        existing collections are announced immediately so attaching
        after a restore covers everything already live. Pass None to
        detach."""
        self._observer = observer
        if observer is not None:
            for collection in self._collections.values():
                observer.collection_registered(collection)

    def flat_index_kwargs(self) -> dict:
        """Construction kwargs for Flat indexes (dtype profile + optional
        mesh), shared by create_collection and the .vlc load path."""
        kwargs: dict = {"device_dtype": self._config.device_dtype}
        n = getattr(self._config, "mesh_devices", 0) or 0
        if n > 1:
            if self._mesh is None:
                import jax

                from ..dist.sharding import make_mesh

                devices = jax.devices()
                if len(devices) < n:
                    raise ValueError(
                        f"VECTORLITE_MESH={n} but only {len(devices)} "
                        f"device(s) are visible"
                    )
                self._mesh = make_mesh(devices[:n])
            kwargs["mesh"] = self._mesh
        return kwargs

    @property
    def embedding_function(self) -> EmbeddingFunction:
        return self._embedding_function

    def create_collection(
        self,
        name: str,
        index_type: IndexType,
        metric: Optional[SimilarityMetric] = None,
    ) -> None:
        if isinstance(index_type, str):
            # SDK convenience: accept "flat"/"hnsw" (case-insensitive);
            # without this, a string would miss the identity check below
            # and silently build the wrong index type.
            index_type = IndexType.parse(index_type)
        if name in self._collections:
            raise CollectionAlreadyExists(name)
        dimension = self._embedding_function.dimension
        if index_type is IndexType.FLAT:
            index = FlatIndex(dimension, **self.flat_index_kwargs())
        else:
            if metric is None:
                # no default: force explicit choice (reference: src/client.rs:96)
                raise MetricRequired()
            index = HNSWIndex(
                dimension,
                metric,
                m=self._config.hnsw_m,
                m0=self._config.hnsw_m0,
                ef_construction=self._config.hnsw_ef_construction,
                ef_search=self._config.hnsw_ef_search,
                # replicated-graph query sharding (dist/hnsw_mesh.py);
                # host C++ stays the default serving path, the mesh beam
                # serves use_device=True batches
                mesh=self.flat_index_kwargs().get("mesh"),
            )
        self._collections[name] = collection = Collection(name, index)
        if self._observer is not None:
            self._observer.collection_registered(collection)

    def get_collection(self, name: str) -> Optional[Collection]:
        return self._collections.get(name)

    def list_collections(self) -> list[str]:
        return list(self._collections.keys())

    def delete_collection(self, name: str) -> None:
        collection = self._collections.pop(name, None)
        if collection is None:
            raise CollectionNotFound(name)
        collection.close()
        if self._observer is not None:
            self._observer.collection_deleted(name)

    def has_collection(self, name: str) -> bool:
        return name in self._collections

    def add_text_to_collection(
        self,
        collection_name: str,
        text: str,
        metadata: Optional[Any] = None,
    ) -> int:
        return self._require(collection_name).add_text_with_metadata(
            text, self._embedding_function, metadata
        )

    def add_texts_to_collection(
        self, collection_name: str, texts, metadatas=None
    ) -> list[int]:
        """Batched insert (TPU-native extension)."""
        return self._require(collection_name).add_texts(
            texts, self._embedding_function, metadatas
        )

    def add_vectors_to_collection(
        self,
        collection_name: str,
        values,
        texts=None,
        metadatas=None,
        ids=None,
    ) -> list[int]:
        """Bulk insert of precomputed embeddings (TPU-native extension;
        no embedder in the loop). Explicit ``ids`` must be fresh u64s
        and advance the collection's id counter past their max."""
        return self._require(collection_name).add_vectors(
            values, texts, metadatas, ids
        )

    def search_vector_in_collection(
        self,
        collection_name: str,
        query,
        k: int,
        similarity_metric: Optional[SimilarityMetric] = None,
        where: Optional[dict] = None,
        ef: Optional[int] = None,
        min_score: Optional[float] = None,
    ) -> list[SearchResult]:
        """Search by one raw query vector (TPU-native extension)."""
        return self.search_vectors_in_collection(
            collection_name, [query], k, similarity_metric, where=where,
            ef=ef, min_score=min_score,
        )[0]

    def search_vectors_in_collection(
        self,
        collection_name: str,
        queries,
        k: int,
        similarity_metric: Optional[SimilarityMetric] = None,
        where: Optional[dict] = None,
        ef: Optional[int] = None,
        min_score: Optional[float] = None,
    ) -> list[list[SearchResult]]:
        """Batched search by raw query vectors (TPU-native extension).
        Metric auto-detect matches text search: HNSW -> its metric,
        Flat -> cosine (reference: src/client.rs:143-155)."""
        collection = self._require(collection_name)
        metric = (
            similarity_metric
            if similarity_metric is not None
            else collection.detected_metric()
        )
        return collection.search_vectors(
            queries, k, metric, where=where, ef=ef, min_score=min_score
        )

    def search_text_in_collection(
        self,
        collection_name: str,
        query_text: str,
        k: int,
        similarity_metric: Optional[SimilarityMetric] = None,
        where: Optional[dict] = None,
        ef: Optional[int] = None,
        min_score: Optional[float] = None,
    ) -> list[SearchResult]:
        collection = self._require(collection_name)
        metric = (
            similarity_metric
            if similarity_metric is not None
            else collection.detected_metric()
        )
        return collection.search_text(
            query_text, k, metric, self._embedding_function, where=where,
            ef=ef, min_score=min_score,
        )

    def search_texts_in_collection(
        self,
        collection_name: str,
        query_texts,
        k: int,
        similarity_metric: Optional[SimilarityMetric] = None,
        where: Optional[dict] = None,
        ef: Optional[int] = None,
        min_score: Optional[float] = None,
    ) -> list[list[SearchResult]]:
        """Batched search (TPU-native extension)."""
        collection = self._require(collection_name)
        metric = (
            similarity_metric
            if similarity_metric is not None
            else collection.detected_metric()
        )
        return collection.search_texts(
            query_texts, k, metric, self._embedding_function, where=where,
            ef=ef, min_score=min_score,
        )

    def search_hybrid_in_collection(
        self,
        collection_name: str,
        query_text: str,
        k: int,
        similarity_metric: Optional[SimilarityMetric] = None,
        where: Optional[dict] = None,
        ef: Optional[int] = None,
        min_score: Optional[float] = None,
        alpha: float = 0.5,
        pool: Optional[int] = None,
    ) -> list[SearchResult]:
        """Hybrid dense + BM25 search with reciprocal-rank fusion
        (extension; see Collection.search_hybrid). ``alpha`` weights
        the dense leg in [0, 1]."""
        collection = self._require(collection_name)
        metric = (
            similarity_metric
            if similarity_metric is not None
            else collection.detected_metric()
        )
        return collection.search_hybrid(
            query_text, k, metric, self._embedding_function, where=where,
            ef=ef, min_score=min_score, alpha=alpha, pool=pool,
        )

    def delete_from_collection(self, collection_name: str, id: int) -> None:
        self._require(collection_name).delete(id)

    def delete_where_in_collection(
        self, collection_name: str, where: dict
    ) -> int:
        """Bulk delete by metadata filter (TPU-native extension).
        Returns the number of vectors removed."""
        return self._require(collection_name).delete_where(where)

    def update_text_in_collection(
        self, collection_name: str, id: int, text: str, metadata=None
    ) -> None:
        """Re-embed + replace a vector in place under the same id
        (TPU-native extension; PUT semantics — metadata is replaced
        too, omit to clear)."""
        self._require(collection_name).update_text(
            id, text, self._embedding_function, metadata
        )

    def update_metadata_in_collection(
        self, collection_name: str, id: int, metadata
    ) -> None:
        """Replace one vector's metadata (TPU-native extension)."""
        self._require(collection_name).update_metadata(id, metadata)

    def get_vectors_from_collection(
        self,
        collection_name: str,
        ids,
        where: Optional[dict] = None,
        include_values: bool = True,
    ):
        """Bulk get by explicit ids (extension): found vectors in the
        requested order; missing ids are skipped."""
        return self._require(collection_name).get_vectors(
            ids, where, include_values
        )

    def list_vectors_in_collection(
        self,
        collection_name: str,
        offset: int = 0,
        limit: int = 100,
        where: Optional[dict] = None,
        include_values: bool = False,
    ):
        """Paged vector listing, optionally where-filtered (extension).
        Returns (vectors, total_matching)."""
        return self._require(collection_name).list_vectors(
            offset, limit, where, include_values
        )

    def get_vector_from_collection(
        self, collection_name: str, id: int
    ) -> Optional[Vector]:
        return self._require(collection_name).get_vector(id)

    def get_collection_info(self, collection_name: str) -> CollectionInfo:
        return self._require(collection_name).get_info()

    def add_collection(self, collection: Collection) -> None:
        """Register a collection directly (used when loading from files,
        reference: src/client.rs:183-191)."""
        name = collection.name
        if name in self._collections:
            raise CollectionAlreadyExists(name)
        self._collections[name] = collection
        if self._observer is not None:
            self._observer.collection_registered(collection)

    def _require(self, name: str) -> Collection:
        collection = self._collections.get(name)
        if collection is None:
            raise CollectionNotFound(name)
        return collection
