"""Engine facade: one object tying together catalog, SQL surface,
corpus queries, raster jobs, and sinks.

    from ccog_spark.engine import Engine
    eng = Engine(sf_dir="/root/testdata/sf0.1")
    eng.sql("SELECT count(*) FROM lineitem").show()
    eng.query("q02").show()
    eng.write_cog(pixels_df, width=..., height=..., bands=..., target="/x.tif")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ccog_spark.catalog import DEFAULT_SF_DIR, register_views
from ccog_spark.session import get_spark


class Engine:
    def __init__(
        self,
        spark: SparkSession | None = None,
        sf_dir: str = DEFAULT_SF_DIR,
        register_udtfs: bool = True,
    ):
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        self.tables = register_views(self.spark, sf_dir)
        if register_udtfs:
            from ccog_spark.functions.udtf_ops import register_udtfs as _reg

            _reg(self.spark)

    # ---- SQL surface (Catalyst end-to-end)
    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self.tables[name]

    # ---- declared corpus
    def query(self, qid: str) -> DataFrame:
        from ccog_spark.queries.registry import REGISTRY

        return REGISTRY[qid](self.spark, self.sf_dir)

    def query_ids(self) -> list[str]:
        from ccog_spark.queries.registry import REGISTRY

        return sorted(REGISTRY)

    # ---- raster jobs
    def write_cog(self, pixels: DataFrame, **kwargs):
        from ccog_spark.raster.cog import write_cog

        return write_cog(self.spark, pixels, **kwargs)

    def read_cog(self, path: str, **kwargs) -> DataFrame:
        """Open a COG/GeoTIFF (incl. foreign strip-based / chunky
        color layouts) as long-form pixels — header on the driver,
        tile ranges decoded on executors. ``window=(x0,y0,x1,y1)``
        prunes tiles spatially at the index."""
        from ccog_spark.sources.cog_reader import read_cog_pixels

        return read_cog_pixels(self.spark, path, **kwargs)

    def rebuild_cog(self, src_path: str, target_path: str, **kwargs):
        """Regenerate/recompress an existing COG from its level 0
        (overview kernel, codec, mask, ghost — gdaladdo-style)."""
        from ccog_spark.raster.cog import rebuild_cog

        return rebuild_cog(self.spark, src_path, target_path, **kwargs)

    # ---- ANN index lifecycle (build once, query many)
    def build_ann_index(self, corpus: DataFrame, dim: int, index_dir: str,
                        **kwargs) -> dict:
        from ccog_spark.operators.ann_index import build_ivfpq_index

        return build_ivfpq_index(corpus, dim, index_dir, **kwargs)

    def query_ann_index(self, index_dir: str, queries: DataFrame,
                        **kwargs) -> DataFrame:
        from ccog_spark.operators.ann_index import query_ivfpq_index

        return query_ivfpq_index(self.spark, index_dir, queries, **kwargs)

    def build_text_index(self, docs: DataFrame, index_dir: str,
                         **kwargs) -> dict:
        """Persisted BM25 inverted index (round 13): bucket-partitioned
        postings/terms/doclens parquet under index_dir."""
        from ccog_spark.operators.text_index import build_bm25_index

        return build_bm25_index(docs, index_dir, **kwargs)

    def query_text_index(self, index_dir: str, queries: DataFrame,
                         **kwargs) -> DataFrame:
        """BM25 top-k from the persisted index — bit-identical to
        bm25() on the indexed corpus."""
        from ccog_spark.operators.text_index import query_bm25_index

        return query_bm25_index(self.spark, index_dir, queries, **kwargs)

    def append_text_index(self, docs_delta: DataFrame, index_dir: str,
                          **kwargs) -> dict:
        """Grow the persisted BM25 index with a corpus delta."""
        from ccog_spark.operators.text_index import append_to_text_index

        return append_to_text_index(docs_delta, index_dir, **kwargs)

    def delete_text_index(self, index_dir: str, doc_ids: DataFrame,
                          **kwargs) -> dict:
        """Delete documents from the persisted BM25 index (round 14):
        tombstones + df-decremented terms + rewritten corpus stats —
        queries answer as if built from the survivors."""
        from ccog_spark.operators.text_index import delete_from_text_index

        return delete_from_text_index(self.spark, index_dir, doc_ids,
                                      **kwargs)

    def compact_text_index(self, index_dir: str) -> dict:
        """Postings rewrite after appends/deletes — restores the
        clustered layout and applies pending tombstones physically."""
        from ccog_spark.operators.text_index import compact_text_index

        return compact_text_index(self.spark, index_dir)

    def delete_ann_index(self, index_dir: str, vec_ids: DataFrame) -> dict:
        """Delete vectors from the persisted IVF+PQ index (round 14):
        tombstoned ids are excluded from every candidate set until
        compact removes their codes physically."""
        from ccog_spark.operators.ann_index import delete_from_ann_index

        return delete_from_ann_index(self.spark, index_dir, vec_ids)

    def verify_text_index(self, index_dir: str) -> dict:
        """Integrity audit of a persisted BM25 index (round 14):
        recompute df/n_docs/sum_dl from the physical tables and
        compare against terms/meta; returns {ok, errors, checked}."""
        from ccog_spark.operators.text_index import verify_text_index

        return verify_text_index(self.spark, index_dir)

    def verify_ann_index(self, index_dir: str) -> dict:
        """Integrity audit of a persisted IVF+PQ index (round 14)."""
        from ccog_spark.operators.ann_index import verify_ann_index

        return verify_ann_index(self.spark, index_dir)

    def compact_ann_index(self, index_dir: str) -> dict:
        """Codes rewrite after appends/deletes — restores the
        clustered layout and applies pending tombstones physically."""
        from ccog_spark.operators.ann_index import compact_ann_index

        return compact_ann_index(self.spark, index_dir)

    def append_ann_index(self, corpus_delta: DataFrame,
                         index_dir: str) -> dict:
        """Grow a persisted index under its frozen model (round 8);
        returns meta incl. the occupancy-skew staleness signal."""
        from ccog_spark.operators.ann_index import append_to_index

        return append_to_index(corpus_delta, index_dir)

    def phrase_match(self, docs: DataFrame, phrases: DataFrame,
                     **kwargs) -> DataFrame:
        """Exact multi-token phrase search over a corpus (round 14):
        (q_id, phrase) → matching (q_id, doc_id, n_matches)."""
        from ccog_spark.operators.text import phrase_match

        return phrase_match(docs, phrases, **kwargs)

    def query_phrase_index(self, index_dir: str,
                           phrases: DataFrame, **kwargs) -> DataFrame:
        """Phrase search from a positional text index (built with
        positions=True) — the corpus is never re-read."""
        from ccog_spark.operators.text_index import phrase_match_index

        return phrase_match_index(self.spark, index_dir, phrases, **kwargs)

    def snippet_match(self, docs: DataFrame, phrases: DataFrame,
                      **kwargs) -> DataFrame:
        """Snippet extraction (round 14): the text window around the
        first exact occurrence of each matching phrase."""
        from ccog_spark.operators.text import snippet_match

        return snippet_match(docs, phrases, **kwargs)

    def query_snippet_index(self, index_dir: str, phrases: DataFrame,
                            docs: DataFrame, **kwargs) -> DataFrame:
        """Snippets with the matching driven by a positional index
        (round 15): ``docs`` supplies only the matching documents'
        text slices (the rerank_corpus shape)."""
        from ccog_spark.operators.text_index import snippet_match_index

        return snippet_match_index(
            self.spark, index_dir, phrases, docs, **kwargs
        )

    def proximity_match(self, docs: DataFrame, phrases: DataFrame,
                        max_span: int, **kwargs) -> DataFrame:
        """Unordered proximity search (round 14): all terms of each
        (q_id, phrase) within ``max_span`` consecutive positions, any
        order → matching (q_id, doc_id, n_matches)."""
        from ccog_spark.operators.text import proximity_match

        return proximity_match(docs, phrases, max_span, **kwargs)

    def query_proximity_index(self, index_dir: str, phrases: DataFrame,
                              max_span: int, **kwargs) -> DataFrame:
        """Proximity search from a positional text index (built with
        positions=True) — the corpus is never re-read."""
        from ccog_spark.operators.text_index import proximity_match_index

        return proximity_match_index(
            self.spark, index_dir, phrases, max_span, **kwargs
        )

    def diversify(self, ranked: DataFrame, groups: DataFrame,
                  group_col: str, **kwargs) -> DataFrame:
        """Result diversification (round 14): re-cut a ranked list to
        at most max_per_group docs per (query, group)."""
        from ccog_spark.operators.text import diversify_topk

        return diversify_topk(ranked, groups, group_col, **kwargs)

    def bm25f(self, docs: DataFrame, queries: DataFrame,
              field_cols: tuple, weights: tuple, **kwargs) -> DataFrame:
        """Multi-field BM25F ranking (round 14)."""
        from ccog_spark.operators.text import bm25f_topk

        return bm25f_topk(docs, queries, field_cols, weights, **kwargs)

    def build_bm25f_index(self, docs: DataFrame, index_dir: str,
                          field_cols: tuple, **kwargs) -> dict:
        """Persisted per-field BM25F index (round 15): raw per-field
        tf/dl stored — weights/k1/b stay query-time parameters."""
        from ccog_spark.operators.text_index import build_bm25f_index

        return build_bm25f_index(docs, index_dir, field_cols, **kwargs)

    def query_bm25f_index(self, index_dir: str, queries: DataFrame,
                          weights: tuple, **kwargs) -> DataFrame:
        """BM25F from the per-field index only — bit-identical to
        bm25f() on the indexed fields."""
        from ccog_spark.operators.text_index import query_bm25f_index

        return query_bm25f_index(
            self.spark, index_dir, queries, weights, **kwargs
        )

    def append_bm25f_index(self, fielded_delta: DataFrame,
                           index_dir: str, **kwargs) -> dict:
        """Grow the per-field index; returns growth + vocab-drift
        stats (round 15)."""
        from ccog_spark.operators.text_index import append_to_bm25f_index

        return append_to_bm25f_index(fielded_delta, index_dir, **kwargs)

    def delete_bm25f_index(self, index_dir: str,
                           doc_ids: DataFrame) -> dict:
        """Tombstone docs out of the per-field index; any-field df and
        per-field stats decremented (round 15)."""
        from ccog_spark.operators.text_index import delete_from_bm25f_index

        return delete_from_bm25f_index(self.spark, index_dir, doc_ids)

    def compact_bm25f_index(self, index_dir: str) -> dict:
        """Apply pending per-field-index tombstones physically and
        restore the clustered layout (round 15)."""
        from ccog_spark.operators.text_index import compact_bm25f_index

        return compact_bm25f_index(self.spark, index_dir)

    def query_prf_index(self, index_dir: str, queries: DataFrame,
                        **kwargs) -> DataFrame:
        """PRF-expanded BM25 from the index only (round 15) — both
        passes and the feedback counts from posting buckets."""
        from ccog_spark.operators.text_index import query_bm25_prf_index

        return query_bm25_prf_index(self.spark, index_dir, queries, **kwargs)

    # ---- retrieval (round 12)
    def bm25(self, docs: DataFrame, queries: DataFrame,
             **kwargs) -> DataFrame:
        """BM25 lexical top-k: queries = (q_id, q_text)."""
        from ccog_spark.operators.text import bm25_topk

        return bm25_topk(docs, queries, **kwargs)

    def bm25_prf(self, docs: DataFrame, queries: DataFrame,
                 **kwargs) -> DataFrame:
        """Pseudo-relevance-feedback expanded BM25 (round 14): pass-1
        top-k_fb docs donate e_terms expansion terms, pass-2 re-ranks."""
        from ccog_spark.operators.text import bm25_prf_topk

        return bm25_prf_topk(docs, queries, **kwargs)

    def ann_rerank(self, corpus: DataFrame, queries: DataFrame, dim: int,
                   **kwargs) -> DataFrame:
        """Two-stage ANN: ADC candidates → exact-cosine re-rank."""
        from ccog_spark.operators.similarity import ivfpq_rerank_topk

        return ivfpq_rerank_topk(corpus, queries, dim, **kwargs)

    def ann_sq8(self, corpus: DataFrame, queries: DataFrame, dim: int,
                **kwargs) -> DataFrame:
        """IVF + 8-bit scalar quantization (round 15): near-exact
        asymmetric distances at dim bytes/vector — the storage point
        between raw floats and PQ."""
        from ccog_spark.operators.similarity import ivfsq_topk

        return ivfsq_topk(corpus, queries, dim, **kwargs)

    def build_sq8_index(self, corpus: DataFrame, dim: int,
                        index_dir: str, **kwargs) -> dict:
        """Persist an IVF+SQ8 index (round 15): scalar codes at dim
        bytes/vector sharing the PQ index's cell-clustered layout and
        full lifecycle (append/delete/compact/verify)."""
        from ccog_spark.operators.ann_index import build_ivfsq_index

        return build_ivfsq_index(corpus, dim, index_dir, **kwargs)

    def query_sq8_index(self, index_dir: str, queries: DataFrame,
                        **kwargs) -> DataFrame:
        """Top-k from a persisted SQ8 index — embeddings never read;
        supports nprobe='auto', vec_filter, rerank_corpus."""
        from ccog_spark.operators.ann_index import query_ivfsq_index

        return query_ivfsq_index(self.spark, index_dir, queries, **kwargs)

    def build_bpe_model(self, docs: DataFrame, model_dir: str,
                        **kwargs) -> dict:
        """Train a BPE tokenizer once and persist merges/alphabet/meta
        as parquet (round 16). Frozen after build — a vocabulary
        change is a rebuild (shifted ids would corrupt every
        downstream artifact)."""
        from ccog_spark.operators.bpe import build_bpe_model

        return build_bpe_model(docs, model_dir, **kwargs)

    def tokenize(self, docs: DataFrame, model_dir: str,
                 **kwargs) -> DataFrame:
        """Token-id column from the persisted BPE model only — training
        never re-runs at query time."""
        from ccog_spark.operators.bpe import tokenize_ids_from_model

        return tokenize_ids_from_model(docs, model_dir, **kwargs)

    def verify_bpe_model(self, model_dir: str) -> dict:
        """Tokenizer-model integrity audit (rank sequence, meta counts,
        sentinel) — the verify_*_index twin."""
        from ccog_spark.operators.bpe import verify_bpe_model

        return verify_bpe_model(self.spark, model_dir)

    def hybrid_search(self, ranked_lexical: DataFrame,
                      ranked_vector: DataFrame, id_col: str,
                      **kwargs) -> DataFrame:
        """Reciprocal-rank fusion of two ranked (q_id, id, rn) frames."""
        from ccog_spark.operators.text import rrf_fuse

        return rrf_fuse(ranked_lexical, ranked_vector, id_col, **kwargs)

    # ---- verification
    def check(self, qid: str, sf_dir: str | None = None):
        from ccog_spark.harness import compare_query

        return compare_query(self.spark, qid, sf_dir or self.sf_dir)
