"""Engine operators beyond plain relational queries.

- ``text``       — tokenization, language-ID, quality scoring, fingerprints
- ``dedup``      — exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding
- ``similarity`` — vector similarity search (exact top-k + LSH-bucketed)
- ``multimodal`` — binary columns with real PPM/BMP/PNG/JPEG-gray decoders
- ``asof``       — as-of / range join strategies
- ``web``        — URL canonicalization / registered domain / URL dedup
- ``bpe``        — BPE tokenizer (distributed counts, map-side encode)
- ``decontam``   — benchmark n-gram decontamination (exact + Bloom)
- ``layout``     — Z-order clustered writes for data skipping
- ``sharding``   — shard/sequence packing, sampling, per-key quotas

All deterministic operators are oracle-checkable because hashing is the
engine-portable rolling hash (functions.hashing), not engine-specific
xxhash/murmur.
"""
