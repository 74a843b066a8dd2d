"""Optional real-dataset smoke test.

Mirrors reference: tests/integration_test.rs:39-66 — loads a JSONL file of
pre-computed embeddings (``{"id": ..., "text": ..., "embedding": [...]}``
per line) into a FlatIndex and sanity-checks search. The dataset file is
not committed; the test skips gracefully when absent, exactly like the
reference.
"""

import json
from pathlib import Path

import pytest

from vectorlite_tpu import FlatIndex, SimilarityMetric, Vector

DATASET = Path(__file__).parent / "datasets" / "github-issues.jsonl"


@pytest.mark.skipif(
    not DATASET.exists(), reason=f"dataset not present: {DATASET}"
)
def test_real_dataset_flat_search():
    vectors = []
    with DATASET.open() as f:
        for i, line in enumerate(f):
            row = json.loads(line)
            emb = row.get("embedding") or row.get("values")
            vectors.append(
                Vector(
                    id=int(row.get("id", i)),
                    values=[float(x) for x in emb],
                    text=str(row.get("text", "")),
                )
            )
    assert vectors, "dataset file was empty"
    dim = len(vectors[0].values)
    index = FlatIndex(dim, vectors)
    assert len(index) == len(vectors)

    # self-query: every sampled vector must be its own nearest neighbor
    for probe in vectors[:: max(1, len(vectors) // 20)]:
        results = index.search(probe.values, 1, SimilarityMetric.COSINE)
        assert results[0].id == probe.id


def test_generated_dataset_jsonl_pipeline(tmp_path):
    """The same JSONL-ingestion pipeline, exercised unconditionally with a
    deterministic generated dataset shaped like the reference's
    github-issues.jsonl (2175 x 768-d pre-computed embeddings,
    reference: tests/integration_test.rs:53) — so the loading code runs
    in every CI pass instead of only when the optional file exists."""
    import numpy as np

    rng = np.random.default_rng(2175)
    n, d = 300, 768  # same schema/dim as the reference dataset, CI-sized
    emb = rng.normal(size=(n, d))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    path = tmp_path / "issues.jsonl"
    with path.open("w") as f:
        for i in range(n):
            f.write(
                json.dumps(
                    {
                        "id": i,
                        "text": f"issue #{i}: synthetic title",
                        "embedding": [float(x) for x in emb[i]],
                    }
                )
                + "\n"
            )

    vectors = []
    with path.open() as f:
        for i, line in enumerate(f):
            row = json.loads(line)
            e = row.get("embedding") or row.get("values")
            vectors.append(
                Vector(
                    id=int(row.get("id", i)),
                    values=[float(x) for x in e],
                    text=str(row.get("text", "")),
                )
            )
    index = FlatIndex(len(vectors[0].values), vectors)
    assert len(index) == n
    for probe in vectors[:: n // 10]:
        results = index.search(probe.values, 1, SimilarityMetric.COSINE)
        assert results[0].id == probe.id
        assert results[0].text.startswith(f"issue #{probe.id}:")
