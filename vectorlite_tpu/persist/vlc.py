"""``.vlc`` snapshot persistence — byte-compatible with the reference format.

The reference saves a collection as pretty-printed JSON with a
version/format header, metadata, and the serde-serialized index wrapper
(reference: src/persistence.rs:63-126), written atomically via a ``.tmp``
file + rename (reference: src/persistence.rs:129-146). The index payload is
externally tagged: ``{"Flat": {...}}`` or ``{"HNSW": {...}}``
(reference: src/lib.rs:270-276).

Loading validates ``version == "1.0.0"`` and
``format == "vectorlite-collection"`` (reference: src/persistence.rs:160-174)
and recomputes next_id as max_id + 1 (reference: src/client.rs:295-308).
HNSW graphs are rebuilt by re-inserting every stored vector
(reference: src/index/hnsw.rs:272-360).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from pathlib import Path

from ..errors import (
    FileNotFound,
    InvalidFormat,
    SerializationError,
    VersionMismatch,
)
from ..index.flat import FlatIndex
from ..index.hnsw import HNSWIndex
from ..store.collection import Collection

FORMAT_VERSION = "1.0.0"
FORMAT_NAME = "vectorlite-collection"


def _now_rfc3339() -> str:
    """chrono-style UTC timestamp, e.g. 2026-08-16T04:45:47.810123Z."""
    dt = datetime.now(timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"


def collection_to_json(collection: Collection) -> dict:
    """Build the CollectionData payload (reference: src/persistence.rs:98-120)."""
    with collection.index_read() as index:
        index_payload = {index.index_type: index.index_to_json()}
        return {
            "header": {
                "version": FORMAT_VERSION,
                "format": FORMAT_NAME,
                "created_at": _now_rfc3339(),
            },
            "metadata": {
                "name": collection.name,
                "created_at": _now_rfc3339(),
                "vector_count": len(index),
                "dimension": index.dimension,
                "index_type": index.index_type,
            },
            "index": index_payload,
        }


def collection_from_json(obj: dict, **index_kwargs) -> Collection:
    header = obj.get("header") or {}
    version = header.get("version")
    if version != FORMAT_VERSION:
        raise VersionMismatch(FORMAT_VERSION, str(version))
    fmt = header.get("format")
    if fmt != FORMAT_NAME:
        raise InvalidFormat(
            f"Expected format '{FORMAT_NAME}', got '{fmt}'"
        )
    index_obj = obj["index"]
    if "Flat" in index_obj:
        index = FlatIndex.index_from_json(index_obj["Flat"], **index_kwargs)
    elif "HNSW" in index_obj:
        index = HNSWIndex.index_from_json(index_obj["HNSW"])
    else:
        raise InvalidFormat(f"Unknown index payload: {list(index_obj)}")
    name = obj.get("metadata", {}).get("name", "")
    return Collection(name, index)


def save_collection_to_file(collection: Collection, path) -> None:
    path = Path(path)
    payload = collection_to_json(collection)
    if path.parent != Path(""):
        os.makedirs(path.parent, exist_ok=True)
    # tmp + atomic rename (reference: src/persistence.rs:137-143); the
    # tmp name is unique per process/thread so concurrent saves to the
    # same (or same-stem) paths never interleave writes
    import threading

    tmp_path = path.with_name(
        f"{path.name}.{os.getpid()}.{threading.get_ident()}.tmp"
    )
    try:
        with open(tmp_path, "w", encoding="utf-8") as f:
            json.dump(payload, f, indent=2)
        os.replace(tmp_path, path)
    finally:
        if tmp_path.exists():
            tmp_path.unlink(missing_ok=True)


def load_collection_from_file(path, **index_kwargs) -> Collection:
    """``index_kwargs`` (e.g. ``device_dtype``, ``mesh``) are forwarded to
    the Flat index constructor so loaded collections adopt the serving
    profile (sharded placement, dtype) of the loading client."""
    path = Path(path)
    try:
        raw = path.read_text(encoding="utf-8")
    except FileNotFoundError:
        raise FileNotFound(str(path)) from None
    try:
        obj = json.loads(raw)
    except json.JSONDecodeError as e:
        raise SerializationError(str(e)) from None
    return collection_from_json(obj, **index_kwargs)
