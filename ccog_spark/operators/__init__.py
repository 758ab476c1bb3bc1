"""Engine operators beyond plain relational queries.

- ``text``       — tokenization, language-ID, quality scoring, fingerprints
- ``dedup``      — exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding
- ``similarity`` — vector similarity search (exact top-k + LSH-bucketed)
- ``multimodal`` — opaque binary columns with typed metadata + decode stubs
- ``asof``       — as-of / range join strategies

All deterministic operators are oracle-checkable because hashing is the
engine-portable rolling hash (functions.hashing), not engine-specific
xxhash/murmur.
"""
