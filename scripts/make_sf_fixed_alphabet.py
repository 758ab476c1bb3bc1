"""Fixed-alphabet scaling fixture for the LM / line-dedup probes
(round 8, VERDICT r7 task 6).

The replica-TAGGED sf fixtures (make_sf1.py) prefix every token with
`r{n}`, which injects new characters/digit contexts into every char
n-gram — the trigram MODEL then grows ~linearly with replicas, which
is a fixture artifact, not an operator property (SCALING.md r7 notes
this). This builder perturbs by WORD ROTATION instead: replica r
rotates each document's word list by r positions. The alphabet — and
in fact the whole token multiset — is exactly preserved, so the
char-trigram model must PLATEAU (bounded by the corpus alphabet³),
which is the saturation behavior real corpora show.

doc_ids still shift by r*stride so dedup-style keys stay unique.

Output: $SF_FA_DIR (default /tmp/ccog_sf_fa)/documents.parquet with
SF_REPLICAS copies (10 → "sf1", 100 → "sf10")."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SF_FA_DIR", "/tmp/ccog_sf_fa")
R = int(os.environ.get("SF_REPLICAS", "10"))


def main():
    os.makedirs(OUT, exist_ok=True)
    docs = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
    stride = int(docs["doc_id"].max()) + 1
    chunks = []
    for r in range(R):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + r * stride
        if r:
            d["text"] = [
                " ".join(w[r % len(w):] + w[: r % len(w)])
                if (w := txt.split(" ")) and len(w) > 1 else txt
                for txt in d["text"]
            ]
        chunks.append(d)
    big = pa.Table.from_pandas(
        pd.concat(chunks, ignore_index=True), preserve_index=False
    )
    pq.write_table(
        big, os.path.join(OUT, "documents.parquet"),
        row_group_size=max(len(big) // 64, 1024),
    )
    print("wrote", OUT, pq.ParquetFile(
        os.path.join(OUT, "documents.parquet")).metadata.num_rows)


if __name__ == "__main__":
    main()
