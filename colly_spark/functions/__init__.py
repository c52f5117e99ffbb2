"""Large-scale training-data pipeline operators (beyond the reference's own
surface): deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding cosine, generic 64-bit-hash / image-phash banding), approximate
similarity search, text analysis (language-ID, quality scoring, token
counting, fingerprinting), corpus preparation (deterministic hash split,
vocabulary df/idf stats, line-level boilerplate dedup, PII redaction), and
multimodal binary-column plumbing. All built on DataFrame ops + Arrow UDFs,
designed for the 100 TB regime (bucketed self-joins, band-bucket LSH instead
of O(n^2) cross joins, no driver-side loops).
"""
