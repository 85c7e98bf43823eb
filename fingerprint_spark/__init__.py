"""fingerprint_spark — a PySpark-native quality-filter / template-assertion engine.

A from-scratch reimplementation of the *capabilities* of cmdrvl/fingerprint
(reference at /root/reference, Rust v0.6.2) as an idiomatic Spark pipeline:

- documents are rows of a DataFrame ``(url, warc_ts, html, text, lang)``
  (reference: JSONL record stream, src/pipeline/reader.rs:59-93);
- structural parsing is one vectorized Arrow/pandas UDF producing a nested
  ``parsed`` struct (reference: src/document/html.rs, markdown.rs);
- template assertions compile to Catalyst Column expressions evaluated
  JVM-side (reference: src/dsl/assertions.rs 30-variant enum);
- rule matching is a broadcast first-match-wins fold, not a shuffle join
  (reference: src/pipeline/enricher.rs:201-268);
- the quality-filter chain (langid -> perplexity -> heuristics -> scrub)
  is a sequence of narrow transformations per BASELINE.json north_star.

No per-row Python UDFs anywhere; Python executes only inside Arrow-batched
pandas UDFs (parse, simhash, perplexity) or at the driver (rule compile).
"""

__version__ = "0.1.0"
