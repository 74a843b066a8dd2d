"""HTTP API — the reference's 11-route contract on aiohttp.

Route table, request/response DTO shapes, default ``k=10``, case-insensitive
index-type/metric parsing, permissive CORS, and the ``{"message": ...}``
error body with the reference status-code mapping are all reproduced from
the reference server (reference: src/server.rs:71-143 DTOs,
src/server.rs:149-165 parsers, src/server.rs:182-359 handlers,
src/server.rs:361-377 router).

Locking mirrors the reference: vector ops take the client-map **read** lock
(each collection has its own lock), while create/delete/load-collection take
the **write** lock (reference: src/server.rs:212, 235, 336). Blocking work
(embedding forward, device compute) runs in a thread-pool executor so the
event loop — the tokio analogue — stays responsive.
"""

from __future__ import annotations

import asyncio
import functools
import json
import logging
from pathlib import Path
from typing import Optional

from aiohttp import web

from ..core.metrics import SimilarityMetric
from ..errors import (
    CollectionAlreadyExists,
    CollectionNotFound,
    VectorLiteError,
    VectorNotFound,
)
from ..observability import LatencyRecorder, capture_device_trace
from ..store.client import IndexType, VectorLiteClient
from ..store.collection import Collection
from ..utils import RWLock

logger = logging.getLogger("vectorlite_tpu.server")

_CLIENT_KEY = web.AppKey("vectorlite_client", VectorLiteClient)
_LOCK_KEY = web.AppKey("vectorlite_lock", RWLock)
_STATS_KEY = web.AppKey("vectorlite_stats", LatencyRecorder)
_AUTOSAVE_KEY = web.AppKey("vectorlite_autosave", object)
_WAL_KEY = web.AppKey("vectorlite_wal", object)


def _error_response(err: VectorLiteError) -> web.Response:
    # reference: src/server.rs:168-179
    return web.json_response({"message": err.message}, status=err.status_code)


_CORS_HEADERS = {
    "Access-Control-Allow-Origin": "*",
    "Access-Control-Allow-Methods": "*",
    "Access-Control-Allow-Headers": "*",
}


def _auth_middleware(api_key: str):
    """Opt-in bearer-token auth (extension; the reference server is
    unauthenticated). When VECTORLITE_API_KEY / create_app(api_key=...)
    is set, every route except GET /health (container healthchecks
    probe it unauthenticated) requires ``Authorization: Bearer <key>``
    or ``X-API-Key: <key>``. Comparison is constant-time."""
    import hmac

    key_bytes = api_key.encode("utf-8")

    @web.middleware
    async def auth(request: web.Request, handler):
        if request.path == "/health":
            return await handler(request)
        supplied = ""
        header = request.headers.get("Authorization", "")
        # auth-scheme is case-insensitive (RFC 7235 §2.1)
        if header[:7].lower() == "bearer ":
            supplied = header[7:]
        elif "X-API-Key" in request.headers:
            supplied = request.headers["X-API-Key"]
        if not hmac.compare_digest(supplied.encode("utf-8"), key_bytes):
            raise web.HTTPUnauthorized(
                text='{"message": "Invalid or missing API key"}',
                content_type="application/json",
            )
        return await handler(request)

    return auth


@web.middleware
async def error_middleware(request: web.Request, handler):
    import time as _time

    # permissive CORS incl. preflight (reference: src/server.rs:374)
    if request.method == "OPTIONS":
        return web.Response(status=204, headers=_CORS_HEADERS)
    start = _time.perf_counter()
    try:
        response = await handler(request)
    except VectorLiteError as e:
        response = _error_response(e)
    except web.HTTPException as e:
        # keep CORS + stats on aiohttp-raised errors (404 routes, bad JSON)
        response = e
    except Exception as e:  # noqa: BLE001
        logger.exception("unhandled error")
        response = web.json_response(
            {"message": f"Internal server error: {e}"}, status=500
        )
    stats = request.app.get(_STATS_KEY)
    if stats is not None:
        route = request.match_info.route.resource
        route_name = route.canonical if route else request.path
        stats.record(
            f"{request.method} {route_name}",
            _time.perf_counter() - start,
            ok=response.status < 500,
        )
    for key, value in _CORS_HEADERS.items():
        response.headers[key] = value
    if isinstance(response, web.HTTPException):
        raise response
    return response


async def _json_body(request: web.Request) -> dict:
    try:
        body = await request.json()
    except web.HTTPRequestEntityTooLarge:
        # keep the 413 (don't mislabel an over-size body as bad JSON),
        # but give it the canonical {"message": ...} shape
        raise web.HTTPRequestEntityTooLarge(
            max_size=getattr(request, "_client_max_size", 0),
            actual_size=request.content_length or 0,
            text=json.dumps(
                {"message": "Request body too large (raise "
                 "VECTORLITE_MAX_BODY_MB or shrink the batch)"}
            ),
            content_type="application/json",
        ) from None
    except Exception:  # noqa: BLE001
        raise web.HTTPBadRequest(
            text='{"message": "Invalid JSON body"}',
            content_type="application/json",
        ) from None
    if not isinstance(body, dict):
        raise web.HTTPBadRequest(
            text='{"message": "Expected JSON object"}',
            content_type="application/json",
        )
    return body


def _require_field(body: dict, name: str):
    if name not in body:
        raise web.HTTPBadRequest(
            text=json.dumps({"message": f"Missing required field: {name}"}),
            content_type="application/json",
        )
    return body[name]


def _require_str(body: dict, name: str) -> str:
    """Required string field. The reference's DTOs type these as serde
    String (src/server.rs:71-100), so a number/null/object here is a
    deserialization reject, not something to coerce via str()."""
    value = _require_field(body, name)
    if not isinstance(value, str):
        raise web.HTTPBadRequest(
            text=json.dumps({"message": f"Field {name} must be a string"}),
            content_type="application/json",
        )
    return value


def _optional_str(body: dict, name: str, default=None):
    """Optional string field (serde Option<String> / #[serde(default)]
    String): absent -> default, null -> None-or-default per serde
    semantics handled by callers, any other non-string -> 400."""
    value = body.get(name, default)
    if value is not None and not isinstance(value, str):
        raise web.HTTPBadRequest(
            text=json.dumps({"message": f"Field {name} must be a string"}),
            content_type="application/json",
        )
    return value


async def _blocking(request: web.Request, fn, *args, **kwargs):
    loop = asyncio.get_running_loop()
    return await loop.run_in_executor(
        None, functools.partial(fn, *args, **kwargs)
    )


# ------------------------------------------------------------------ handlers


async def health_check(request: web.Request) -> web.Response:
    # reference: src/server.rs:182-187
    return web.json_response({"status": "healthy", "service": "vectorlite"})


async def list_collections(request: web.Request) -> web.Response:
    client = request.app[_CLIENT_KEY]

    # acquire the (writer-preferring) app lock off the event loop: a
    # load/create holding the write lock for seconds would otherwise
    # park the loop thread and stall every request incl. /health
    def run():
        with request.app[_LOCK_KEY].read():
            return client.list_collections()

    collections = await _blocking(request, run)
    return web.json_response({"collections": collections})


async def create_collection(request: web.Request) -> web.Response:
    body = await _json_body(request)
    name = _require_str(body, "name")
    index_type = IndexType.parse(_require_str(body, "index_type"))
    # serde String + #[serde(default)]: absent -> "", present non-string
    # (incl. null) -> type reject; empty string means "not specified"
    # (reference: src/server.rs:75-77, 206-210)
    metric_str = body.get("metric", "")
    if not isinstance(metric_str, str):
        raise web.HTTPBadRequest(
            text='{"message": "Field metric must be a string"}',
            content_type="application/json",
        )
    metric = SimilarityMetric.parse(metric_str) if metric_str else None

    client = request.app[_CLIENT_KEY]

    def run():
        with request.app[_LOCK_KEY].write():
            client.create_collection(name, index_type, metric)

    await _blocking(request, run)
    logger.info("Created collection: %s", name)
    return web.json_response({"name": name})


async def get_collection_info(request: web.Request) -> web.Response:
    name = request.match_info["name"]
    client = request.app[_CLIENT_KEY]
    with request.app[_LOCK_KEY].read():
        info = client.get_collection_info(name)
    return web.json_response({"info": info.to_json()})


async def delete_collection(request: web.Request) -> web.Response:
    name = request.match_info["name"]
    client = request.app[_CLIENT_KEY]
    with request.app[_LOCK_KEY].write():
        client.delete_collection(name)
    logger.info("Deleted collection: %s", name)
    return web.json_response({"name": name})


async def add_text(request: web.Request) -> web.Response:
    name = request.match_info["name"]
    body = await _json_body(request)
    text = _require_str(body, "text")
    metadata = body.get("metadata")
    client = request.app[_CLIENT_KEY]

    def run():
        with request.app[_LOCK_KEY].read():
            return client.add_text_to_collection(name, text, metadata)

    vid = await _blocking(request, run)
    logger.info("Added text to collection '%s' with ID: %s", name, vid)
    return web.json_response({"id": vid})


#: k bounds from the API contract (reference: docs/openapi.yaml:624-630)
K_MIN, K_MAX = 1, 1000


def _parse_k(body: dict) -> int:
    """Default k=10 (reference: src/server.rs:263); non-integers and values
    outside the contract's 1..1000 are a 400."""
    k = body.get("k", None)
    if k is None:
        return 10
    if not isinstance(k, int) or isinstance(k, bool):
        raise web.HTTPBadRequest(
            text='{"message": "Field k must be an integer"}',
            content_type="application/json",
        )
    if not K_MIN <= k <= K_MAX:
        raise web.HTTPBadRequest(
            text=json.dumps(
                {"message": f"Field k must be between {K_MIN} and {K_MAX}"}
            ),
            content_type="application/json",
        )
    return k


def _parse_min_score(body: dict):
    """Optional similarity floor (extension): absent/null means no
    floor; a present value must be a finite JSON number. All four
    metrics are similarities (higher = better), so results with
    score < min_score are dropped (post-truncation of the sorted list,
    so fewer than k hits can come back)."""
    import math

    v = body.get("min_score", None)
    if v is None:
        return None
    def bad():
        return web.HTTPBadRequest(
            text='{"message": "Field min_score must be a finite number"}',
            content_type="application/json",
        )

    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise bad()
    try:
        f = float(v)  # a ~10^400 JSON int overflows float conversion
    except OverflowError:
        raise bad()
    if not math.isfinite(f):
        raise bad()
    return f


def _parse_ef(body: dict):
    """Optional per-request HNSW beam width (extension): absent/null
    means the collection's configured ef_search; 0 means the
    reference-exact beam (ef == min(k, len), src/index/hnsw.rs:437-448);
    larger trades latency for recall. Exact Flat search accepts and
    ignores it (any recall request is trivially satisfied)."""
    ef = body.get("ef", None)
    if ef is None:
        return None
    if (
        not isinstance(ef, int)
        or isinstance(ef, bool)
        or not 0 <= ef <= 65536
    ):
        raise web.HTTPBadRequest(
            text='{"message": "Field ef must be an integer between 0 '
            'and 65536"}',
            content_type="application/json",
        )
    return ef


def _parse_search_metric(body: dict):
    """Search-side metric parsing: absent/null means auto-detect, but a
    PRESENT string — including "" — must parse or 400. The reference's
    SearchTextRequest.similarity_metric is Option<String>, so Some("")
    reaches parse_similarity_metric and errors (src/server.rs:264-266),
    unlike create's #[serde(default)] metric where "" means unset."""
    metric_raw = _optional_str(body, "similarity_metric")
    if metric_raw is None:
        return None
    return SimilarityMetric.parse(metric_raw)


def _parse_where(body: dict):
    """Optional metadata filter (TPU-native extension): absent/null means
    unfiltered; anything present must be a JSON object (the clause's
    operators are validated by core/filter.py, raising InvalidFilter ->
    400 with the canonical message)."""
    where = body.get("where", None)
    if where is None:
        return None
    if not isinstance(where, dict):
        raise web.HTTPBadRequest(
            text='{"message": "Invalid filter: where clause must be a '
            'JSON object"}',
            content_type="application/json",
        )
    return where


async def search_text(request: web.Request) -> web.Response:
    name = request.match_info["name"]
    body = await _json_body(request)
    query = _require_str(body, "query")
    k = _parse_k(body)
    metric = _parse_search_metric(body)
    where = _parse_where(body)
    ef = _parse_ef(body)
    min_score = _parse_min_score(body)
    client = request.app[_CLIENT_KEY]

    def run():
        with request.app[_LOCK_KEY].read():
            return client.search_text_in_collection(
                name, query, k, metric, where=where, ef=ef,
                min_score=min_score,
            )

    results = await _blocking(request, run)
    logger.info(
        "Search completed for collection '%s' with %d results",
        name,
        len(results),
    )
    return web.json_response({"results": [r.to_json() for r in results]})


def _parse_alpha(body: dict) -> float:
    """Hybrid fusion weight: the dense leg's share, in [0, 1]."""
    v = body.get("alpha", 0.5)
    def bad():
        return web.HTTPBadRequest(
            text='{"message": "Field alpha must be a number in [0, 1]"}',
            content_type="application/json",
        )

    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise bad()
    try:
        f = float(v)  # a ~10^400 JSON int overflows float conversion
    except OverflowError:
        raise bad() from None
    if not (0.0 <= f <= 1.0):
        raise bad()
    return f


def _parse_pool(body: dict):
    """Per-leg candidate pool for hybrid fusion (optional)."""
    v = body.get("pool", None)
    if v is None:
        return None
    if isinstance(v, bool) or not isinstance(v, int) or not (
        1 <= v <= 1000
    ):
        raise web.HTTPBadRequest(
            text='{"message": "Field pool must be an integer in '
            '[1, 1000]"}',
            content_type="application/json",
        )
    return int(v)


async def search_hybrid(request: web.Request) -> web.Response:
    """Hybrid dense + BM25 search with reciprocal-rank fusion
    (extension; the reference is dense-only). Body: {"query",
    "k"?, "alpha"? (dense weight, default 0.5), "pool"? (per-leg
    candidates), "similarity_metric"?, "where"?, "ef"?, "min_score"?}.
    Scores in the response are fused RRF scores, not similarities."""
    name = request.match_info["name"]
    body = await _json_body(request)
    query = _require_str(body, "query")
    k = _parse_k(body)
    metric = _parse_search_metric(body)
    where = _parse_where(body)
    ef = _parse_ef(body)
    min_score = _parse_min_score(body)
    alpha = _parse_alpha(body)
    pool = _parse_pool(body)
    client = request.app[_CLIENT_KEY]

    def run():
        with request.app[_LOCK_KEY].read():
            return client.search_hybrid_in_collection(
                name, query, k, metric, where=where, ef=ef,
                min_score=min_score, alpha=alpha, pool=pool,
            )

    results = await _blocking(request, run)
    logger.info(
        "Hybrid search completed for collection '%s' with %d results",
        name,
        len(results),
    )
    return web.json_response({"results": [r.to_json() for r in results]})


async def add_texts(request: web.Request) -> web.Response:
    """Batched insert (TPU-native extension): one embedder forward for the
    whole batch. Body: {"texts": [...], "metadatas": [...]?}."""
    name = request.match_info["name"]
    body = await _json_body(request)
    texts = _require_field(body, "texts")
    if not isinstance(texts, list) or not all(
        isinstance(t, str) for t in texts
    ):
        raise web.HTTPBadRequest(
            text='{"message": "Field texts must be a list of strings"}',
            content_type="application/json",
        )
    metadatas = body.get("metadatas")
    client = request.app[_CLIENT_KEY]

    def run():
        with request.app[_LOCK_KEY].read():
            return client.add_texts_to_collection(name, texts, metadatas)

    try:
        ids = await _blocking(request, run)
    except ValueError as e:
        raise web.HTTPBadRequest(
            text=json.dumps({"message": str(e)}),
            content_type="application/json",
        ) from None
    logger.info(
        "Added %d texts to collection '%s'", len(ids), name
    )
    return web.json_response({"ids": ids})


async def search_texts(request: web.Request) -> web.Response:
    """Batched search (TPU-native extension): the whole query batch rides
    one device program. Body: {"queries": [...], "k"?, "similarity_metric"?}.
    """
    name = request.match_info["name"]
    body = await _json_body(request)
    queries = _require_field(body, "queries")
    if not isinstance(queries, list) or not all(
        isinstance(q, str) for q in queries
    ):
        raise web.HTTPBadRequest(
            text='{"message": "Field queries must be a list of strings"}',
            content_type="application/json",
        )
    k = _parse_k(body)
    metric = _parse_search_metric(body)
    where = _parse_where(body)
    ef = _parse_ef(body)
    min_score = _parse_min_score(body)
    client = request.app[_CLIENT_KEY]

    def run():
        with request.app[_LOCK_KEY].read():
            return client.search_texts_in_collection(
                name, queries, k, metric, where=where, ef=ef,
                min_score=min_score,
            )

    batches = await _blocking(request, run)
    return web.json_response(
        {
            "results": [
                [r.to_json() for r in batch] for batch in batches
            ]
        }
    )


def _parse_number_array(value, field: str) -> list[float]:
    """A JSON array of finite numbers (serde Vec<f64> semantics: bools,
    strings, nulls, and NaN/Infinity — which Python's json parser
    accepts but serde_json rejects — are all 400s, not coercions)."""
    import math

    if (
        not isinstance(value, list)
        or not value
        or any(
            isinstance(x, bool) or not isinstance(x, (int, float))
            for x in value
        )
    ):
        raise web.HTTPBadRequest(
            text=json.dumps(
                {"message": f"Field {field} must be a non-empty array "
                 "of numbers"}
            ),
            content_type="application/json",
        )
    if any(not math.isfinite(x) for x in value):
        raise web.HTTPBadRequest(
            text=json.dumps(
                {"message": f"Field {field} must contain only finite "
                 "numbers"}
            ),
            content_type="application/json",
        )
    return [float(x) for x in value]


def _reject_ragged(rows: list, field: str) -> None:
    if rows and any(len(r) != len(rows[0]) for r in rows):
        raise web.HTTPBadRequest(
            text=json.dumps(
                {"message": f"All {field} must share one dimension"}
            ),
            content_type="application/json",
        )


async def add_vectors(request: web.Request) -> web.Response:
    """Extension route: bulk insert of PRECOMPUTED embeddings — no
    embedder in the loop. Body: {"vectors": [{"values": [...],
    "text"?, "metadata"?, "id"?}, ...]} (the Vector record shape).
    Explicit ids are all-or-none per request and must be fresh u64s
    (409 on reuse). Returns {"ids": [...]}."""
    name = request.match_info["name"]
    body = await _json_body(request)
    vectors = _require_field(body, "vectors")
    if not isinstance(vectors, list) or not all(
        isinstance(v, dict) for v in vectors
    ):
        raise web.HTTPBadRequest(
            text='{"message": "Field vectors must be a list of objects"}',
            content_type="application/json",
        )
    rows: list[list[float]] = []
    texts: list[str] = []
    metadatas: list = []
    ids: list = []
    for i, v in enumerate(vectors):
        if "values" not in v:
            raise web.HTTPBadRequest(
                text=json.dumps(
                    {"message": f"Missing required field: "
                     f"vectors[{i}].values"}
                ),
                content_type="application/json",
            )
        rows.append(_parse_number_array(v["values"], f"vectors[{i}].values"))
        text = v.get("text", "")
        if text is None:
            text = ""
        if not isinstance(text, str):
            raise web.HTTPBadRequest(
                text=json.dumps(
                    {"message": f"Field vectors[{i}].text must be a string"}
                ),
                content_type="application/json",
            )
        texts.append(text)
        metadatas.append(v.get("metadata"))
        vid = v.get("id")
        if vid is not None and (
            isinstance(vid, bool)
            or not isinstance(vid, int)
            or vid < 0
            or vid >= 1 << 64
        ):
            raise web.HTTPBadRequest(
                text=json.dumps(
                    {"message": f"Field vectors[{i}].id must be a u64 "
                     "integer"}
                ),
                content_type="application/json",
            )
        ids.append(vid)
    _reject_ragged(rows, "vectors[i].values")
    if any(i is None for i in ids):
        if any(i is not None for i in ids):
            raise web.HTTPBadRequest(
                text='{"message": "Either every vector must carry an id '
                'or none"}',
                content_type="application/json",
            )
        ids = None
    client = request.app[_CLIENT_KEY]

    def run():
        with request.app[_LOCK_KEY].read():
            return client.add_vectors_to_collection(
                name, rows, texts, metadatas, ids
            )

    try:
        out_ids = await _blocking(request, run)
    except ValueError as e:
        raise web.HTTPBadRequest(
            text=json.dumps({"message": str(e)}),
            content_type="application/json",
        ) from None
    logger.info(
        "Added %d precomputed vectors to collection '%s'", len(out_ids), name
    )
    return web.json_response({"ids": out_ids})


async def search_vector(request: web.Request) -> web.Response:
    """Extension route: search by one raw query vector (the reference
    only exposes this at the library level, src/lib.rs:293-298).
    Body: {"vector": [...], "k"?, "similarity_metric"?, "where"?}."""
    name = request.match_info["name"]
    body = await _json_body(request)
    query = _parse_number_array(_require_field(body, "vector"), "vector")
    k = _parse_k(body)
    metric = _parse_search_metric(body)
    where = _parse_where(body)
    ef = _parse_ef(body)
    min_score = _parse_min_score(body)
    client = request.app[_CLIENT_KEY]

    def run():
        with request.app[_LOCK_KEY].read():
            return client.search_vector_in_collection(
                name, query, k, metric, where=where, ef=ef,
                min_score=min_score,
            )

    try:
        results = await _blocking(request, run)
    except ValueError as e:
        raise web.HTTPBadRequest(
            text=json.dumps({"message": str(e)}),
            content_type="application/json",
        ) from None
    return web.json_response({"results": [r.to_json() for r in results]})


async def search_vectors(request: web.Request) -> web.Response:
    """Extension route: batched raw-vector search — the whole query
    batch rides one device program. Body: {"vectors": [[...], ...],
    "k"?, "similarity_metric"?, "where"?}."""
    name = request.match_info["name"]
    body = await _json_body(request)
    raw = _require_field(body, "vectors")
    if not isinstance(raw, list) or not raw:
        raise web.HTTPBadRequest(
            text='{"message": "Field vectors must be a non-empty list '
            'of arrays"}',
            content_type="application/json",
        )
    queries = [
        _parse_number_array(q, f"vectors[{i}]") for i, q in enumerate(raw)
    ]
    _reject_ragged(queries, "vectors")
    k = _parse_k(body)
    metric = _parse_search_metric(body)
    where = _parse_where(body)
    ef = _parse_ef(body)
    min_score = _parse_min_score(body)
    client = request.app[_CLIENT_KEY]

    def run():
        with request.app[_LOCK_KEY].read():
            return client.search_vectors_in_collection(
                name, queries, k, metric, where=where, ef=ef,
                min_score=min_score,
            )

    try:
        batches = await _blocking(request, run)
    except ValueError as e:
        raise web.HTTPBadRequest(
            text=json.dumps({"message": str(e)}),
            content_type="application/json",
        ) from None
    return web.json_response(
        {"results": [[r.to_json() for r in batch] for batch in batches]}
    )


def _parse_vector_id(request: web.Request) -> int:
    """Vector ids are u64 in the reference (Path<u64>, src/server.rs),
    so a negative or > 2^64-1 path segment is a parse reject (400),
    not a well-formed id that happens to be absent (404)."""
    raw = request.match_info["id"]
    # Python int() accepts "1_0", unicode digits, and " 5 " — Rust's
    # u64 FromStr accepts only [+]ASCII-digits, so gate on that first
    digits = raw[1:] if raw.startswith("+") else raw
    try:
        if not (digits.isascii() and digits.isdigit()):
            raise ValueError
        vid = int(digits)
        if vid >= 1 << 64:
            raise ValueError
        return vid
    except ValueError:
        raise web.HTTPBadRequest(
            text='{"message": "Invalid vector id"}',
            content_type="application/json",
        ) from None


def _parse_where_param(request: web.Request) -> Optional[dict]:
    """Decode the ``where`` query param (URL-encoded JSON clause) or
    None when absent; 400 on anything that is not a JSON object. Deep
    clause validation happens in core/filter.compile_where."""
    where_raw = request.query.get("where")
    if where_raw is None:
        return None
    try:
        where = json.loads(where_raw)
    except json.JSONDecodeError:
        where = "<invalid>"
    if not isinstance(where, dict):
        raise web.HTTPBadRequest(
            text='{"message": "Invalid filter: where clause must be '
            'a JSON object"}',
            content_type="application/json",
        )
    return where


async def list_vectors(request: web.Request) -> web.Response:
    """Extension route: paged vector listing, optionally where-filtered.
    Query params: offset (default 0), limit (default 100, max 1000),
    include_values (0/1), where (URL-encoded JSON clause)."""
    name = request.match_info["name"]

    def int_param(key: str, default: int, lo: int, hi: int) -> int:
        raw = request.query.get(key)
        if raw is None:
            return default
        try:
            val = int(raw)
        except ValueError:
            val = -1
        if not lo <= val <= hi:
            raise web.HTTPBadRequest(
                text=json.dumps(
                    {
                        "message": (
                            f"Query param {key} must be an integer in "
                            f"[{lo}, {hi}]"
                        )
                    }
                ),
                content_type="application/json",
            )
        return val

    offset = int_param("offset", 0, 0, (1 << 63) - 1)
    limit = int_param("limit", 100, 0, 1000)
    include_values = request.query.get("include_values", "0") in (
        "1",
        "true",
    )
    where = _parse_where_param(request)
    client = request.app[_CLIENT_KEY]

    ids_raw = request.query.get("ids")
    if ids_raw is not None:
        # bulk get by explicit ids (extension): ids=1,2,3 — found
        # vectors in the requested order, missing ids skipped; combines
        # with where= and include_values=, ignores offset/limit
        def bad_ids():
            return web.HTTPBadRequest(
                text='{"message": "Query param ids must be a '
                'comma-separated list of at most 1000 u64 ids"}',
                content_type="application/json",
            )

        tokens = ids_raw.split(",")
        if not ids_raw or len(tokens) > 1000:
            raise bad_ids()
        ids = []
        for tok in tokens:
            # strict u64 (no sign, no whitespace, no 1_0 separators);
            # length-capped so int() never hits CPython's 4300-digit limit
            if not tok.isascii() or not tok.isdigit() or len(tok) > 20:
                raise bad_ids()
            vid = int(tok)
            if vid >= 1 << 64:
                raise bad_ids()
            ids.append(vid)

        def run_ids():
            with request.app[_LOCK_KEY].read():
                return client.get_vectors_from_collection(
                    name, ids, where, include_values
                )

        vectors = await _blocking(request, run_ids)
        return web.json_response(
            {
                "vectors": [v.to_json() for v in vectors],
                "total": len(vectors),
            }
        )

    def run():
        with request.app[_LOCK_KEY].read():
            return client.list_vectors_in_collection(
                name, offset, limit, where, include_values
            )

    vectors, total = await _blocking(request, run)
    return web.json_response(
        {
            "vectors": [v.to_json() for v in vectors],
            "total": total,
            "offset": offset,
            "limit": limit,
        }
    )


async def get_vector(request: web.Request) -> web.Response:
    name = request.match_info["name"]
    vid = _parse_vector_id(request)
    client = request.app[_CLIENT_KEY]
    with request.app[_LOCK_KEY].read():
        vector = client.get_vector_from_collection(name, vid)
    if vector is None:
        raise VectorNotFound(vid)
    return web.json_response({"vector": vector.to_json()})


async def delete_vector(request: web.Request) -> web.Response:
    name = request.match_info["name"]
    vid = _parse_vector_id(request)
    client = request.app[_CLIENT_KEY]

    # off the event loop: delete takes the collection WRITE lock (it can
    # wait behind a long device search) and may trigger O(N) compaction
    def run():
        with request.app[_LOCK_KEY].read():
            client.delete_from_collection(name, vid)

    await _blocking(request, run)
    logger.info("Deleted vector %s from collection '%s'", vid, name)
    return web.json_response({})


async def delete_vectors_where(request: web.Request) -> web.Response:
    """Extension route: bulk delete by metadata filter —
    DELETE /collections/{name}/vectors?where=<url-encoded JSON clause>.
    ``where`` is REQUIRED so a bare DELETE on the listing URL can never
    wipe a collection by accident; ``where={}`` is an explicit
    clear-all. Returns {"deleted": n}."""
    name = request.match_info["name"]
    where = _parse_where_param(request)
    if where is None:
        raise web.HTTPBadRequest(
            text='{"message": "Query param where is required '
            '(use where={} to delete every vector)"}',
            content_type="application/json",
        )
    client = request.app[_CLIENT_KEY]

    # off the event loop: takes the collection WRITE lock and may
    # trigger O(N) compaction (same contract as single-id delete)
    def run():
        with request.app[_LOCK_KEY].read():
            return client.delete_where_in_collection(name, where)

    deleted = await _blocking(request, run)
    logger.info(
        "Deleted %d vectors from collection '%s' by filter", deleted, name
    )
    return web.json_response({"deleted": deleted})


async def update_vector_metadata(request: web.Request) -> web.Response:
    """Extension route: replace one vector's metadata in place (the
    reference can only delete + re-add, burning a new id). Body must
    carry the "metadata" key; null clears. The embedding is untouched."""
    name = request.match_info["name"]
    vid = _parse_vector_id(request)
    body = await _json_body(request)
    if "metadata" not in body:
        raise web.HTTPBadRequest(
            text='{"message": "Field metadata is required (null clears)"}',
            content_type="application/json",
        )
    metadata = body["metadata"]
    client = request.app[_CLIENT_KEY]

    def run():
        with request.app[_LOCK_KEY].read():
            client.update_metadata_in_collection(name, vid, metadata)

    await _blocking(request, run)
    logger.info(
        "Updated metadata for vector %s in collection '%s'", vid, name
    )
    return web.json_response({"id": vid})


async def replace_vector(request: web.Request) -> web.Response:
    """Extension route: PUT full replacement under the same id — the
    body's "text" is re-embedded and text/values/metadata are all
    swapped (metadata omitted = cleared; use PATCH for metadata-only).
    404 when the id is not live."""
    name = request.match_info["name"]
    vid = _parse_vector_id(request)
    body = await _json_body(request)
    text = _require_str(body, "text")
    metadata = body.get("metadata")
    client = request.app[_CLIENT_KEY]

    # off the event loop: embeds, then takes the collection WRITE lock
    def run():
        with request.app[_LOCK_KEY].read():
            client.update_text_in_collection(name, vid, text, metadata)

    await _blocking(request, run)
    logger.info("Replaced vector %s in collection '%s'", vid, name)
    return web.json_response({"id": vid})


async def compact_collection(request: web.Request) -> web.Response:
    """Extension route: reclaim tombstoned slots/nodes (the reference
    leaks HNSW soft deletes forever, reference: src/index/hnsw.rs:400-414).
    HNSW compaction is an O(N·insert) rebuild — runs off the event loop."""
    name = request.match_info["name"]
    client = request.app[_CLIENT_KEY]

    def run():
        with request.app[_LOCK_KEY].read():
            collection = client.get_collection(name)
            if collection is None:
                raise CollectionNotFound(name)
            return collection.compact()

    reclaimed = await _blocking(request, run)
    logger.info(
        "Compacted collection '%s': reclaimed %d", name, reclaimed
    )
    return web.json_response({"reclaimed": int(reclaimed)})


async def save_collection(request: web.Request) -> web.Response:
    name = request.match_info["name"]
    body = await _json_body(request)
    file_path = _require_str(body, "file_path")
    client = request.app[_CLIENT_KEY]

    def run():
        with request.app[_LOCK_KEY].read():
            collection = client.get_collection(name)
            if collection is None:
                raise CollectionNotFound(name)
            collection.save_to_file(Path(file_path))

    await _blocking(request, run)
    logger.info("Saved collection '%s' to file: %s", name, file_path)
    return web.json_response({"file_path": file_path})


async def load_collection(request: web.Request) -> web.Response:
    body = await _json_body(request)
    file_path = _require_str(body, "file_path")
    requested_name = _optional_str(body, "collection_name")
    client = request.app[_CLIENT_KEY]

    def run():
        loaded = Collection.load_from_file(
            Path(file_path), **client.flat_index_kwargs()
        )
        name = requested_name or loaded.name
        with request.app[_LOCK_KEY].write():
            if client.has_collection(name):
                raise CollectionAlreadyExists(name)
            # re-wrap under the requested name; next_id recomputed
            # (reference: src/server.rs:344-353)
            with loaded.index_read() as index:
                client.add_collection(Collection(name, index))
        return name

    name = await _blocking(request, run)
    logger.info("Loaded collection '%s' from file: %s", name, file_path)
    return web.json_response({"collection_name": name})


async def download_snapshot(request: web.Request) -> web.StreamResponse:
    """GET /collections/{name}/snapshot (extension): stream the
    collection's .vlc document — byte-identical to what POST /save
    writes — over HTTP, so operators can back up a collection without
    filesystem access to the server. The payload is built under the
    read lock (index_to_json snapshots the small tables and lazily
    references the truth matrix — see FlatRowsView), then rendered
    incrementally in the executor and streamed in ~1 MB chunks with
    backpressure: a 1M x 384 corpus renders to ~12 GB of JSON, and
    neither the corpus copy, the rendered document, nor more than a few
    chunks are ever resident."""
    import threading

    from ..persist import vlc as _vlc

    name = request.match_info["name"]
    client = request.app[_CLIENT_KEY]

    def build_payload():
        with request.app[_LOCK_KEY].read():
            collection = client.get_collection(name)
            if collection is None:
                raise CollectionNotFound(name)
            return _vlc.collection_to_json(collection)

    payload = await _blocking(request, build_payload)

    resp = web.StreamResponse()
    resp.content_type = "application/json"
    from urllib.parse import quote as _q

    resp.headers["Content-Disposition"] = (
        f"attachment; filename*=UTF-8''{_q(name, safe='')}.vlc"
    )
    for h, v in _CORS_HEADERS.items():
        resp.headers[h] = v
    await resp.prepare(request)

    loop = asyncio.get_running_loop()
    queue: asyncio.Queue = asyncio.Queue(maxsize=4)
    aborted = threading.Event()

    class _LoopWriter:
        """write(str) target for persist.vlc._FileSink (which owns the
        ~1 MB fragment batching): hands each batched chunk to the event
        loop, blocking (backpressure) when the client reads slower than
        the renderer emits."""

        def write(self, s: str) -> None:
            if aborted.is_set():
                raise ConnectionResetError("client disconnected")
            asyncio.run_coroutine_threadsafe(
                queue.put(s.encode("utf-8")), loop
            ).result()

    def render():
        try:
            sink = _vlc._FileSink(_LoopWriter(), limit=1 << 20)
            _vlc._emit(payload, 0, sink)
            sink.flush()
            asyncio.run_coroutine_threadsafe(queue.put(b""), loop).result()
        except BaseException as e:  # noqa: BLE001 - forwarded to the loop
            try:
                asyncio.run_coroutine_threadsafe(queue.put(e), loop).result()
            except Exception:  # loop gone: nothing left to notify
                pass

    render_task = loop.run_in_executor(None, render)
    try:
        while True:
            item = await queue.get()
            if isinstance(item, BaseException):
                if not isinstance(item, ConnectionResetError):
                    logger.error("snapshot render failed: %s", item)
                break
            if item == b"":
                break
            try:
                await resp.write(item)
            except (ConnectionResetError, ConnectionError):
                aborted.set()
    finally:
        aborted.set()
        # drain so the renderer never blocks forever on a full queue
        while not render_task.done():
            try:
                queue.get_nowait()
            except asyncio.QueueEmpty:
                await asyncio.sleep(0.01)
        await resp.write_eof()
    logger.info("Streamed snapshot of collection '%s'", name)
    return resp


async def restore_snapshot(request: web.Request) -> web.Response:
    """POST /collections/{name}/snapshot (extension): body is a raw
    .vlc document (e.g. a previous snapshot download); creates
    collection ``{name}`` from it — the upload twin of the download
    route, with /collections/load's conflict/validation semantics. The
    URL name wins over the document's embedded metadata name
    (restore-as).

    The body is STREAMED to a temp file next to nothing resident, so
    the general request-body cap (--max-body-mb, sized for JSON DTOs)
    does not apply; uploads are bounded instead by
    VECTORLITE_MAX_SNAPSHOT_MB (default 65536 = 64 GiB, 0 = unlimited)
    — matching the download route, which was built to stream ~12 GB
    documents a buffered upload twin could never re-ingest. Parsing
    still materializes the document once (the zero-copy parser views
    into one buffer); the stream removes the cap and the extra aiohttp
    + read() copies."""
    import os
    import tempfile

    name = request.match_info["name"]
    client = request.app[_CLIENT_KEY]
    from ..utils import env_number

    cap_mb = env_number("VECTORLITE_MAX_SNAPSHOT_MB", 65536, float)
    limit = int(cap_mb * 1024**2) if cap_mb > 0 else None

    from ..persist.vlc import load_collection_from_file

    fd, tmp = tempfile.mkstemp(suffix=".vlc.upload")
    try:
        total = 0
        with os.fdopen(fd, "wb") as f:
            # request.content bypasses client_max_size (enforced only
            # by request.read()); buffered 64K-1M writes land in page
            # cache without stalling the loop
            while True:
                chunk = await request.content.readany()
                if not chunk:
                    break
                total += len(chunk)
                if limit is not None and total > limit:
                    raise web.HTTPRequestEntityTooLarge(
                        max_size=limit,
                        actual_size=total,
                        text='{"message": "Snapshot exceeds '
                        "VECTORLITE_MAX_SNAPSHOT_MB "
                        f'({cap_mb:g} MiB)"}}',
                        content_type="application/json",
                    )
                f.write(chunk)

        def run():
            loaded = load_collection_from_file(
                tmp, **client.flat_index_kwargs()
            )
            with request.app[_LOCK_KEY].write():
                if client.has_collection(name):
                    raise CollectionAlreadyExists(name)
                with loaded.index_read() as index:
                    client.add_collection(Collection(name, index))
                    count = len(index)
            return count

        count = await _blocking(request, run)
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass
    logger.info(
        "Restored collection '%s' from snapshot (%d vectors)", name, count
    )
    return web.json_response(
        {"collection_name": name, "vector_count": int(count)}
    )


# --------------------------------------------------------------------- app


async def get_stats(request: web.Request) -> web.Response:
    """Per-route latency percentiles (extension; SURVEY §5 observability)."""
    from ..observability import coalesce_stats, filter_stats

    body = request.app[_STATS_KEY].snapshot()
    body["coalesce"] = coalesce_stats.snapshot()
    body["filters"] = filter_stats.snapshot()
    autosave = request.app.get(_AUTOSAVE_KEY)
    if autosave is not None:
        body["autosave"] = autosave.stats()
    wal = request.app.get(_WAL_KEY)
    if wal is not None:
        # off-loop: stats() does one stat() per collection log, which
        # must not park the event loop on a slow filesystem
        body["wal"] = await _blocking(request, wal.stats)
    return web.json_response(body)


async def get_metrics(request: web.Request) -> web.Response:
    """Prometheus text-format scrape endpoint (extension; the reference
    has logs only, SURVEY §5). Same counters as /stats plus live
    per-collection gauges."""
    from ..observability import (
        coalesce_stats,
        filter_stats,
        render_prometheus,
    )

    client = request.app[_CLIENT_KEY]

    # off-loop: a periodic scraper must not park the event loop behind
    # a long-held write lock (load/create build collections for seconds)
    def snapshot():
        with request.app[_LOCK_KEY].read():
            return {
                name: client.get_collection_info(name).count
                for name in client.list_collections()
            }

    collections = await _blocking(request, snapshot)
    autosave = request.app.get(_AUTOSAVE_KEY)
    wal = request.app.get(_WAL_KEY)
    # wal.stats() stats each log file: off-loop like the snapshot above
    wal_stats = (
        await _blocking(request, wal.stats) if wal is not None else None
    )
    body = render_prometheus(
        request.app[_STATS_KEY].snapshot(),
        coalesce_stats.snapshot(),
        filter_stats.snapshot(),
        collections,
        autosave.stats() if autosave is not None else None,
        wal_stats,
    )
    return web.Response(
        text=body, content_type="text/plain", charset="utf-8"
    )


async def debug_trace(request: web.Request) -> web.Response:
    """Capture a jax.profiler device trace (extension; gated by env)."""
    import os

    if not os.environ.get("VECTORLITE_JAX_PROFILE_DIR"):
        return web.json_response(
            {"message": "Set VECTORLITE_JAX_PROFILE_DIR to enable tracing"},
            status=400,
        )
    seconds = float(request.query.get("seconds", "2"))
    path = await _blocking(request, capture_device_trace, seconds)
    return web.json_response({"trace_dir": path})


async def openapi_spec(request: web.Request) -> web.Response:
    """Serve the API contract (the reference ships docs/openapi.yaml as
    the cross-implementation contract, reference: docs/openapi.yaml:1-839;
    serving it makes the contract discoverable from the running engine)."""
    spec = _openapi_spec_text()
    if spec is None:
        raise web.HTTPNotFound(
            text='{"message": "OpenAPI spec not available"}',
            content_type="application/json",
        )
    return web.Response(text=spec, content_type="application/yaml")


_spec_cache: "str | None" = None


def _openapi_spec_text():
    """Contract text: the repo's docs/openapi.yaml in a source checkout,
    else the copy packaged inside the wheel (tests pin them identical).
    Failures are NOT cached, so a transient read error heals on retry."""
    global _spec_cache
    if _spec_cache is not None:
        return _spec_cache
    here = Path(__file__).resolve()
    for path in (
        here.parents[2] / "docs" / "openapi.yaml",
        here.parent / "openapi.yaml",
    ):
        try:
            _spec_cache = path.read_text(encoding="utf-8")
            return _spec_cache
        except OSError:
            continue
    return None


def create_app(
    client: VectorLiteClient, *, autosave=None, api_key=None, wal=None
) -> web.Application:
    """Router mirror of reference: src/server.rs:361-377, plus the
    /stats, /debug/trace, and /openapi.yaml extensions. ``autosave`` is
    an optional started ``store.autosave.AutosaveDaemon``; the app owns
    its shutdown (final flush) and surfaces its counters at /stats.
    ``wal`` is an optional attached ``store.wal.WalManager`` (oplog
    durability); the app surfaces its counters at /stats and closes the
    logs on shutdown. ``api_key`` (default: $VECTORLITE_API_KEY)
    enables bearer-token auth on every route except GET /health; pass
    ``""`` to force an unauthenticated server even when the env var is
    set (only ``None`` falls back to the environment)."""
    import os as _os

    if api_key is None:
        api_key = _os.environ.get("VECTORLITE_API_KEY") or None
    # bulk routes (/texts, /vectors) carry multi-MB JSON bodies; aiohttp's
    # 1 MiB default would bounce them. VECTORLITE_MAX_BODY_MB overrides.
    from ..utils import env_number

    max_body_mb = env_number("VECTORLITE_MAX_BODY_MB", 256, float)
    if max_body_mb <= 0:
        # aiohttp treats 0 as "no limit" and a negative cap 413s every
        # request with a body — neither is a sane operator intent
        logger.warning(
            "VECTORLITE_MAX_BODY_MB=%s is not a positive number; "
            "using the 256 MiB default",
            max_body_mb,
        )
        max_body_mb = 256
    # error_middleware is outermost so 401s still get CORS headers and
    # show up in the /stats counters; OPTIONS preflight short-circuits
    # there, so auth never blocks CORS preflight
    middlewares = [error_middleware]
    if api_key:
        middlewares.append(_auth_middleware(api_key))
        logger.info("API-key auth enabled (all routes except GET /health)")
    app = web.Application(
        middlewares=middlewares,
        client_max_size=int(max_body_mb * 1024**2),
    )
    app[_CLIENT_KEY] = client
    app[_LOCK_KEY] = RWLock()
    app[_STATS_KEY] = LatencyRecorder()
    if autosave is not None:
        app[_AUTOSAVE_KEY] = autosave

        async def _stop_autosave(app_):
            autosave.stop(flush=True)

        app.on_cleanup.append(_stop_autosave)
    if wal is not None:
        app[_WAL_KEY] = wal

        async def _close_wal(app_):
            # after the autosave final flush above, so the last
            # checkpoint lands before the logs close
            wal.close()

        app.on_cleanup.append(_close_wal)
    app.router.add_get("/openapi.yaml", openapi_spec)
    app.router.add_get("/stats", get_stats)
    app.router.add_get("/metrics", get_metrics)
    app.router.add_post("/debug/trace", debug_trace)
    app.router.add_get("/health", health_check)
    app.router.add_get("/collections", list_collections)
    app.router.add_post("/collections", create_collection)
    app.router.add_get("/collections/{name}", get_collection_info)
    app.router.add_delete("/collections/{name}", delete_collection)
    app.router.add_post("/collections/{name}/text", add_text)
    app.router.add_post("/collections/{name}/search/text", search_text)
    # batched extensions (one device program per batch)
    app.router.add_post("/collections/{name}/texts", add_texts)
    app.router.add_post("/collections/{name}/search/texts", search_texts)
    app.router.add_post("/collections/{name}/search/hybrid", search_hybrid)
    # raw-vector extensions (precomputed embeddings in, vector queries in)
    app.router.add_post("/collections/{name}/vectors", add_vectors)
    app.router.add_post("/collections/{name}/search/vector", search_vector)
    app.router.add_post("/collections/{name}/search/vectors", search_vectors)
    app.router.add_get("/collections/{name}/vectors", list_vectors)
    app.router.add_get("/collections/{name}/vectors/{id}", get_vector)
    app.router.add_delete("/collections/{name}/vectors", delete_vectors_where)
    app.router.add_delete("/collections/{name}/vectors/{id}", delete_vector)
    app.router.add_patch(
        "/collections/{name}/vectors/{id}", update_vector_metadata
    )
    app.router.add_put("/collections/{name}/vectors/{id}", replace_vector)
    app.router.add_post("/collections/{name}/compact", compact_collection)
    app.router.add_post("/collections/{name}/save", save_collection)
    app.router.add_post("/collections/load", load_collection)
    app.router.add_get("/collections/{name}/snapshot", download_snapshot)
    app.router.add_post("/collections/{name}/snapshot", restore_snapshot)
    return app


def start_server(
    client: VectorLiteClient,
    host: str = "127.0.0.1",
    port: int = 3001,
    *,
    autosave=None,
    api_key=None,
    wal=None,
) -> None:
    """Blocking serve loop (reference: src/server.rs:379-392)."""
    app = create_app(client, autosave=autosave, api_key=api_key, wal=wal)
    logger.info("VectorLite server starting on %s:%s", host, port)
    web.run_app(app, host=host, port=port, print=None)
