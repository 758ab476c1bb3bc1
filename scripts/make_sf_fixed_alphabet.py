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

Round 14 adds embeddings.parquet to the fixture (the hybrid-index
per-batch probe needs a vector side at the same scale): replica r
shifts vec_id by the same stride rule and ROLLS each embedding array
by r % dim positions, composed (round 15, for r >= dim where the
roll alone wraps back to an earlier replica's points) with a sign
flip of coordinate (r // dim) % dim — both transforms are isometries,
so norms and the pairwise-distance distribution are preserved, and
replicas never collapse onto identical points (unique up to
SF_REPLICAS < dim², i.e. 4096 at dim=64), keeping IVF cell occupancy
realistic instead of degenerate.

Output: $SF_FA_DIR (default /tmp/ccog_sf_fa)/{documents,embeddings}
.parquet with SF_REPLICAS copies (10 → "sf1", 100 → "sf10")."""

import os

import numpy as np
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

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet")).to_pandas()
    vstride = int(emb["vec_id"].max()) + 1
    dim = len(emb["embedding"].iloc[0])
    mat = np.stack(emb["embedding"].to_numpy())
    echunks = []
    for r in range(R):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + r * vstride
        if r:
            # roll by r % dim AND flip the sign of coordinate block
            # (r // dim) % dim — the second transform varies when the
            # roll wraps (r >= dim), so replicas never collapse onto
            # identical points (round-15 ADVICE: the roll alone made
            # replicas 64-99 duplicate 0-35's exact vectors at
            # SF_REPLICAS=100, dim=64, understating IVF occupancy)
            m = np.roll(mat, r % dim, axis=1).copy()
            flip = (r // dim) % dim
            if r >= dim:
                m[:, flip] = -m[:, flip]
            e["embedding"] = list(m)
        echunks.append(e)
    ebig = pd.concat(echunks, ignore_index=True)
    ebig["embedding"] = [np.asarray(v, dtype=np.float32) for v in ebig["embedding"]]
    et = pa.Table.from_pandas(ebig, preserve_index=False)
    et = et.set_column(
        et.schema.get_field_index("embedding"),
        pa.field("embedding", pa.list_(pa.float32())),
        et["embedding"].cast(pa.list_(pa.float32())),
    )
    pq.write_table(
        et, os.path.join(OUT, "embeddings.parquet"),
        row_group_size=max(len(et) // 32, 1024),
    )
    print("wrote embeddings", pq.ParquetFile(
        os.path.join(OUT, "embeddings.parquet")).metadata.num_rows)


if __name__ == "__main__":
    main()
