"""Index protocol — the uniform interface over Flat and HNSW indexes.

Mirrors the reference ``VectorIndex`` trait (reference: src/lib.rs:224-245)
plus the wrapper-level ``metric()``/``index_type()`` accessors
(reference: src/lib.rs:329-346). Python duck typing replaces the Rust enum
dispatch; both index classes implement this protocol directly.
"""

from __future__ import annotations

from typing import Optional, Protocol, Sequence, runtime_checkable

from ..core.metrics import SimilarityMetric
from ..core.types import SearchResult, Vector


@runtime_checkable
class VectorIndex(Protocol):
    def add(self, vector: Vector) -> None: ...

    def delete(self, id: int) -> None: ...

    def search(
        self, query: Sequence[float], k: int, metric: SimilarityMetric
    ) -> list[SearchResult]: ...

    def __len__(self) -> int: ...

    def is_empty(self) -> bool: ...

    def get_vector(self, id: int) -> Optional[Vector]: ...

    @property
    def dimension(self) -> int: ...

    def metric(self) -> Optional[SimilarityMetric]:
        """The metric the index was built for; None = all metrics (Flat)."""
        ...

    @property
    def index_type(self) -> str:
        """"Flat" or "HNSW" (reference: src/persistence.rs:104-107)."""
        ...

    def max_id(self) -> Optional[int]: ...

    def index_to_json(self) -> dict:
        """Serialize to the reference .vlc ``index`` payload shape."""
        ...
