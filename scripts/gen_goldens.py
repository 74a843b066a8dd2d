"""Regenerate the Python-side golden .vlc fixtures (tests/golden/).

These fixtures pin the serde_json byte format of the reference engine
(reference: src/persistence.rs:63-126). The authoritative generator is
scripts/gen_goldens.rs, which uses the real Rust engine; this script
produces the same bytes from our emitter (persist/vlc.py:dumps_pretty)
with pinned timestamps, so the fixtures stay deterministic and
reviewable. If a cargo-equipped environment regenerates with the Rust
script and the bytes differ (modulo created_at), the bug is in
dumps_pretty's ryu emulation — fix it there, never by editing fixtures
to match.

Run: python scripts/gen_goldens.py
"""

from pathlib import Path

from vectorlite_tpu.persist.vlc import dumps_pretty

GOLDEN = Path(__file__).parent.parent / "tests" / "golden"

T1 = "2025-01-15T10:30:45.123456789Z"
T2 = "2025-02-20T08:15:30.987654321Z"


def header(ts):
    return {
        "version": "1.0.0",
        "format": "vectorlite-collection",
        "created_at": ts,
    }


def metadata(name, ts, count, dim, index_type):
    return {
        "name": name,
        "created_at": ts,
        "vector_count": count,
        "dimension": dim,
        "index_type": index_type,
    }


def vec(id, values, text, meta=None):
    return {"id": id, "values": values, "text": text, "metadata": meta}


def write(name, payload):
    path = GOLDEN / name
    path.write_text(dumps_pretty(payload), encoding="utf-8")
    print(f"wrote {path}")


def main():
    # ---- flat edge cases: unicode, -0.0, denormal, 1e308, decimal/
    # scientific boundaries, escapes, nested/empty metadata
    write(
        "flat_edge_reference.vlc",
        {
            "header": header(T1),
            "metadata": metadata("golden_flat_edge", T1, 3, 3, "Flat"),
            "index": {
                "Flat": {
                    "dim": 3,
                    "data": [
                        vec(
                            0,
                            [-0.0, 5e-324, 1e308],
                            "héllo 世界 🚀",
                            {
                                "a": {
                                    "b": [1, None, {"c": "ü"}],
                                    "empty": {},
                                },
                                "list": [],
                            },
                        ),
                        vec(3, [1e-5, 1e-6, 1e16], "", None),
                        vec(
                            4,
                            [0.1, 1e15, -2.5],
                            'tab\tnewline\n"quoted"',
                            {"n": -1},
                        ),
                    ],
                }
            },
        },
    )

    # ---- empty collection
    write(
        "flat_empty_reference.vlc",
        {
            "header": header(T1),
            "metadata": metadata("golden_flat_empty", T1, 0, 384, "Flat"),
            "index": {"Flat": {"dim": 384, "data": []}},
        },
    )

    # ---- HNSW x all four metrics (reference variant names,
    # src/lib.rs:363-378). Values chosen so each metric has a distinct
    # nearest neighbor for the probe query in the tests.
    hnsw_vals = {
        "20": [1.0, 0.0, 0.5],
        "21": [0.0, 1.0, -0.25],
        "22": [0.5, 0.5, 1e-5],
    }
    hnsw_meta = {
        "20": {"text": "erste", "metadata": None},
        "21": {"text": "zwölf 🌍", "metadata": {"k": [1.5, None]}},
        "22": {"text": "", "metadata": None},
    }
    for metric in ("Cosine", "Euclidean", "Manhattan", "DotProduct"):
        write(
            f"hnsw_{metric.lower()}_reference.vlc",
            {
                "header": header(T2),
                "metadata": metadata(
                    f"golden_hnsw_{metric.lower()}", T2, 3, 3, "HNSW"
                ),
                "index": {
                    "HNSW": {
                        "dim": 3,
                        "metric": metric,
                        "id_to_index": {"20": 0, "21": 1, "22": 2},
                        "index_to_id": {"0": 20, "1": 21, "2": 22},
                        "metadata": hnsw_meta,
                        "vector_values": hnsw_vals,
                    }
                },
            },
        )


if __name__ == "__main__":
    main()
