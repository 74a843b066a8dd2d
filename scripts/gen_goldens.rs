//! Regenerate tests/golden/*.vlc from the REAL reference engine.
//!
//! This environment has no Rust toolchain, so the checked-in fixtures
//! were produced by scripts/gen_goldens.py through our serde_json-
//! compatible emitter (persist/vlc.py:dumps_pretty). In any
//! cargo-equipped environment this program re-derives them from the
//! reference crate itself; it is the authoritative recipe.
//!
//! Usage (from a checkout of mmailhos/vectorlite):
//!   1. copy this file to examples/gen_goldens.rs
//!   2. cargo run --example gen_goldens --features mock-embeddings
//!   3. copy the emitted *.vlc over tests/golden/ in this repo
//!   4. python -m pytest tests/test_golden_vlc.py
//! A byte mismatch (modulo the created_at timestamps, which the test
//! normalizes) is a bug in vlc.py's ryu/serde emulation — fix it there,
//! never by editing fixtures to match.

use serde_json::json;
use vectorlite::{
    FlatIndex, HNSWIndex, SimilarityMetric, Vector, VectorIndex,
    VectorIndexWrapper,
};

fn save(name: &str, index: VectorIndexWrapper, coll: &str) {
    // mirror persistence.rs CollectionData shape with the wrapper's own
    // serde output, via to_string_pretty — byte-for-byte what
    // save_collection_to_file writes
    let payload = json!({
        "header": {
            "version": "1.0.0",
            "format": "vectorlite-collection",
            // pinned so regenerated fixtures diff cleanly; the loader
            // never validates timestamps
            "created_at": "2025-01-15T10:30:45.123456789Z",
        },
        "metadata": {
            "name": coll,
            "created_at": "2025-01-15T10:30:45.123456789Z",
            "vector_count": index.len(),
            "dimension": index.dimension(),
            "index_type": match index { VectorIndexWrapper::Flat(_) => "Flat", _ => "HNSW" },
        },
        "index": serde_json::to_value(&index).unwrap(),
    });
    std::fs::write(
        format!("{name}.vlc"),
        serde_json::to_string_pretty(&payload).unwrap(),
    )
    .unwrap();
    eprintln!("wrote {name}.vlc");
}

fn main() {
    // flat edge cases: unicode text, -0.0, denormal, f64::MAX-range,
    // decimal/scientific boundary values, escapes, nested metadata
    let mut flat = FlatIndex::new(3);
    flat.add(Vector {
        id: 0,
        values: vec![-0.0, 5e-324, 1e308],
        text: "héllo 世界 🚀".into(),
        metadata: Some(json!({
            "a": {"b": [1, null, {"c": "ü"}], "empty": {}},
            "list": [],
        })),
    })
    .unwrap();
    flat.add(Vector {
        id: 3,
        values: vec![1e-5, 1e-6, 1e16],
        text: "".into(),
        metadata: None,
    })
    .unwrap();
    flat.add(Vector {
        id: 4,
        values: vec![0.1, 1e15, -2.5],
        text: "tab\tnewline\n\"quoted\"".into(),
        metadata: Some(json!({"n": -1})),
    })
    .unwrap();
    save(
        "flat_edge_reference",
        VectorIndexWrapper::Flat(flat),
        "golden_flat_edge",
    );

    save(
        "flat_empty_reference",
        VectorIndexWrapper::Flat(FlatIndex::new(384)),
        "golden_flat_empty",
    );

    // HNSW x all four metrics. NOTE: Rust HashMap iteration order is
    // random, so HNSW fixtures pin FIELD equality, not byte equality —
    // the pytest golden test compares parsed payloads for these.
    for metric in [
        SimilarityMetric::Cosine,
        SimilarityMetric::Euclidean,
        SimilarityMetric::Manhattan,
        SimilarityMetric::DotProduct,
    ] {
        let mut h = HNSWIndex::new(3, metric);
        for (id, values, text, meta) in [
            (20u64, vec![1.0, 0.0, 0.5], "erste", None),
            (
                21,
                vec![0.0, 1.0, -0.25],
                "zwölf 🌍",
                Some(json!({"k": [1.5, null]})),
            ),
            (22, vec![0.5, 0.5, 1e-5], "", None),
        ] {
            h.add(Vector {
                id,
                values,
                text: text.into(),
                metadata: meta,
            })
            .unwrap();
        }
        let name = format!(
            "hnsw_{}_reference",
            format!("{metric:?}").to_lowercase()
        );
        let coll = format!("golden_{name}").replace("_reference", "");
        save(&name, VectorIndexWrapper::HNSW(h), &coll);
    }
}
