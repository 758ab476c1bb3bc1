"""Build the sf1 scaling fixture (10x sf0.1) for the heavy
documents/embeddings queries.

Construction (documented in SCALING.md): each replica r in 0..9 of the
sf0.1 corpus gets ids shifted by r*stride and a structure-preserving
perturbation —

- documents: every TOKEN is prefixed with the replica tag, so shingle
  sets within a replica keep their exact near-dup relations while
  inter-replica Jaccard drops to 0 (pair counts scale LINEARLY, the
  honest scaling regime; naive text copies would square them).
- embeddings: coordinates are sign-flipped by a per-replica +-1
  diagonal (cosines within a replica are EXACTLY preserved;
  inter-replica cosines decorrelate).

Output: /tmp/ccog_sf1/{documents,embeddings}.parquet
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SF1_DIR", "/tmp/ccog_sf1")
R = int(os.environ.get("SF_REPLICAS", "10"))


def main():
    os.makedirs(OUT, exist_ok=True)

    docs = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
    stride = int(docs["doc_id"].max()) + 1
    chunks = []
    for r in range(R):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + r * stride
        tag = f"r{r}"
        d["text"] = [
            " ".join(tag + t for t in txt.split(" ")) for txt in d["text"]
        ]
        chunks.append(d)
    big = pa.Table.from_pandas(
        __import__("pandas").concat(chunks, ignore_index=True),
        preserve_index=False,
    )
    pq.write_table(big, os.path.join(OUT, "documents.parquet"),
                   row_group_size=50_000 // 32 + 1)

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet")).to_pandas()
    vstride = int(emb["vec_id"].max()) + 1
    dim = len(emb["embedding"].iloc[0])
    rng = np.random.default_rng(7)
    echunks = []
    for r in range(R):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + r * vstride
        signs = rng.choice([-1.0, 1.0], size=dim).astype("f4")
        e["embedding"] = [
            (np.asarray(v, dtype="f4") * signs) for v in e["embedding"]
        ]
        echunks.append(e)
    bige = pa.Table.from_pandas(
        __import__("pandas").concat(echunks, ignore_index=True),
        preserve_index=False,
    )
    pq.write_table(bige, os.path.join(OUT, "embeddings.parquet"),
                   row_group_size=20_000 // 32 + 1)
    print("wrote", OUT,
          pq.ParquetFile(os.path.join(OUT, "documents.parquet")).metadata.num_rows,
          pq.ParquetFile(os.path.join(OUT, "embeddings.parquet")).metadata.num_rows)


if __name__ == "__main__":
    main()
