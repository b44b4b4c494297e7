"""Engine operators beyond Spark's built-in relational surface.

``joins``       as-of & range joins (SURVEY.md §2.4 "not implemented by
                the reference" list) as shuffle-aware compositions.
``dedup``       exact / MinHash-LSH / SimHash / n-gram-Jaccard
                deduplication (SURVEY.md §2.13).
``similarity``  brute-force & LSH-bucketed ANN over embeddings.
``multimodal``  opaque-binary column conventions + Pandas-UDF plumbing.
"""
