//! Dump real-Tantivy golden vectors for the fugu_tpu parity suite.
//!
//! Mirrors the reference's setup exactly:
//! - docs schema fields id/text/name as TEXT|STORED, facet as a Facet
//!   field (/root/reference/src/db/schemas.rs:7-59)
//! - QueryParser::for_index over [text, name]
//!   (/root/reference/src/db/search.rs:108-112)
//! - TopDocs collector, limit 30, default BM25
//!
//! Reads  ../../tests/golden/corpus.json  + queries.json
//! Writes ../../tests/golden/tantivy_golden.json:
//!   {"tantivy_version": "0.24.1",
//!    "results": {query: [[doc_id, score_f32_bits], ...]}}
//!
//! Scores are dumped as u32 bit patterns of the f32 so the Python side
//! can assert bit-for-bit equality with no text-roundtrip loss.

use std::fs;

use tantivy::collector::TopDocs;
use tantivy::query::QueryParser;
use tantivy::schema::{Facet, FacetOptions, Schema, Value, STORED, TEXT};
use tantivy::{doc, Index, TantivyDocument};

fn main() {
    let base = concat!(env!("CARGO_MANIFEST_DIR"), "/../../tests/golden");
    let corpus: serde_json::Value =
        serde_json::from_str(&fs::read_to_string(format!("{base}/corpus.json")).unwrap())
            .unwrap();
    let queries: Vec<String> =
        serde_json::from_str(&fs::read_to_string(format!("{base}/queries.json")).unwrap())
            .unwrap();

    let mut sb = Schema::builder();
    let f_id = sb.add_text_field("id", TEXT | STORED);
    let f_text = sb.add_text_field("text", TEXT | STORED);
    let f_name = sb.add_text_field("name", TEXT | STORED);
    let f_facet = sb.add_facet_field("facet", FacetOptions::default().set_stored());
    let schema = sb.build();

    let index = Index::create_in_ram(schema.clone());
    let mut writer = index.writer(50_000_000).unwrap();
    for rec in corpus.as_array().unwrap() {
        let mut d = doc!(
            f_id => rec["id"].as_str().unwrap(),
            f_text => rec["text"].as_str().unwrap(),
        );
        if let Some(name) = rec.get("name").and_then(|v| v.as_str()) {
            d.add_text(f_name, name);
        }
        if let Some(facets) = rec.get("facets").and_then(|v| v.as_array()) {
            for f in facets {
                d.add_facet(f_facet, Facet::from(f.as_str().unwrap()));
            }
        }
        writer.add_document(d).unwrap();
    }
    writer.commit().unwrap();

    let reader = index.reader().unwrap();
    let searcher = reader.searcher();
    let parser = QueryParser::for_index(&index, vec![f_text, f_name]);

    let mut results = serde_json::Map::new();
    for q in &queries {
        let parsed = match parser.parse_query(q) {
            Ok(p) => p,
            Err(e) => {
                eprintln!("query {q:?} failed to parse: {e}");
                results.insert(q.clone(), serde_json::Value::Null);
                continue;
            }
        };
        let top = searcher
            .search(&parsed, &TopDocs::with_limit(30))
            .unwrap();
        let mut hits = Vec::new();
        for (score, addr) in top {
            let retrieved: TantivyDocument = searcher.doc(addr).unwrap();
            let id = retrieved
                .get_first(f_id)
                .and_then(|v| v.as_str())
                .unwrap()
                .to_string();
            hits.push(serde_json::json!([id, score.to_bits()]));
        }
        results.insert(q.clone(), serde_json::Value::Array(hits));
    }

    let out = serde_json::json!({
        "tantivy_version": "0.24.1",
        "limit": 30,
        "results": results,
    });
    fs::write(
        format!("{base}/tantivy_golden.json"),
        serde_json::to_string_pretty(&out).unwrap(),
    )
    .unwrap();
    eprintln!("wrote {} query results", queries.len());
}
