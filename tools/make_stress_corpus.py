#!/usr/bin/env python3
"""Rebuild the 10x stress corpora used by the scale sweeps (verify SKILL.md).

Round 7 built these ad hoc and the scripts died with /tmp; this committed
generator makes the sweep reproducible in any round.

  python3 tools/make_stress_corpus.py rel  /tmp/sf10rel   # relational 10x
  python3 tools/make_stress_corpus.py text /tmp/sf1x      # docs+embeddings 10x

An optional third argument scales the replica count (default 10):

  python3 tools/make_stress_corpus.py rel      /tmp/sf100rel 100
  python3 tools/make_stress_corpus.py textsalt /tmp/sf100x   100

textsalt: like text, but each replica's tokens are SALTED with the replica
number instead of rotated — replicas share no shingles, so true near-dup
pair volume grows LINEARLY with the corpus (each replica carries sf0.1's
internal dup structure and nothing cross-replica). This is the right
instrument for wall-clock growth laws: the rotated `text` corpus is an
adversarial near-dup regime whose TRUE answer grows quadratically in
replicas (every rotation shares nearly all shingles with its original),
which measures pair explosion, not engine scaling. Embeddings are rotated
as in `text` (coordinate rotations decorrelate directions, so the vector
side is already linear-regime). Note the salted vocabulary breaks the
31-token corpus facts some REGISTERED oracles assume — textsalt corpora
are for the scale sweep families (dedup/CC/vector), not full-registry
verification.

rel: key-offset replicas of /root/testdata/sf0.1 — replica k adds k*10^9 to
every key column (FK-consistent, so joins fan out realistically: 6M lineitem,
1.5M orders, 1M events, 150k customer, 10k supplier, 200k part);
nation/region/documents/embeddings are copied through unchanged. Everything
is written with pyarrow so on-disk types are PRESERVED byte-for-byte
(a DuckDB rewrite would silently retype columns — that is exactly the class
of drift FixturesContractSpec exists to catch).

text: 50k documents = 10 token-rotated replicas of sf0.1's 5k docs (replica
k rotates each doc's token sequence left by k, doc_id += k*10^9 — an
adversarial near-dup regime: replicas share nearly all shingles with their
original, pair volume grows ~10,000x); 20k embeddings = 10 dim-rotated
replicas of the 2k vectors (cyclic shift of coordinates by k preserves the
norm to the last ulp, vec_id += k*10^9).
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = "/root/testdata/sf0.1"
OFF = 10**9
REPLICAS = 10  # default; override with argv[3]

# key columns per table that get the replica offset (FK-consistent)
REL_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
REL_COPY = ["nation", "region", "documents", "embeddings"]


def replicate_keys(table, keys, out_path):
    chunks = []
    for k in range(REPLICAS):
        t = table
        for col in keys:
            i = t.schema.get_field_index(col)
            shifted = pc.add(t.column(col), pa.scalar(k * OFF, t.schema.field(col).type))
            t = t.set_column(i, t.schema.field(col), shifted)
        chunks.append(t)
    merged = pa.concat_tables(chunks)
    pq.write_table(merged, out_path, compression="snappy")
    print(f"  {out_path}: {merged.num_rows} rows, schema preserved")


def gen_rel(outdir):
    import os
    os.makedirs(outdir, exist_ok=True)
    for name, keys in REL_KEYS.items():
        replicate_keys(pq.read_table(f"{SRC}/{name}.parquet"), keys,
                       f"{outdir}/{name}.parquet")
    for name in REL_COPY:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{outdir}/{name}.parquet", compression="snappy")
        print(f"  {outdir}/{name}.parquet: {t.num_rows} rows (copied)")


def gen_text(outdir, salt=False):
    import os
    os.makedirs(outdir, exist_ok=True)
    docs = pq.read_table(f"{SRC}/documents.parquet").to_pylist()
    out = []
    for k in range(REPLICAS):
        for r in docs:
            toks = r["text"].split(" ")
            if salt and k > 0:
                new = [f"{t}~r{k}" for t in toks]  # "~" is absent from the vocab: no cross-replica collisions (ADVICE r9)
            else:
                new = toks[k % len(toks):] + toks[:k % len(toks)] if toks else toks
            out.append({**r, "doc_id": r["doc_id"] + k * OFF,
                        "text": " ".join(new),
                        "n_chars": len(" ".join(new))})
    schema = pq.read_schema(f"{SRC}/documents.parquet")
    pq.write_table(pa.Table.from_pylist(out, schema=schema),
                   f"{outdir}/documents.parquet", compression="snappy")
    print(f"  {outdir}/documents.parquet: {len(out)} rows")

    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pylist()
    out = []
    for k in range(REPLICAS):
        for r in emb:
            v = r["embedding"]
            v2 = v[k % len(v):] + v[:k % len(v)]
            # rotation alone wraps at dim replicas (replica 64 of a 64-dim
            # vector == replica 0 → exact-dup explosion at 100x); sign-flip
            # each full rotation cycle so every replica stays distinct
            # (norm preserved exactly, cosine to the original is -1)
            if (k // len(v)) % 2 == 1:
                v2 = [-x for x in v2]
            out.append({**r, "vec_id": r["vec_id"] + k * OFF,
                        "embedding": v2})
    schema = pq.read_schema(f"{SRC}/embeddings.parquet")
    pq.write_table(pa.Table.from_pylist(out, schema=schema),
                   f"{outdir}/embeddings.parquet", compression="snappy")
    print(f"  {outdir}/embeddings.parquet: {len(out)} rows")
    # the relational side of the text corpus: copy through so Verify-style
    # runs that touch lineitem etc. still resolve
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events"]:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{outdir}/{name}.parquet", compression="snappy")


if __name__ == "__main__":
    kind, outdir = sys.argv[1], sys.argv[2]
    if len(sys.argv) > 3:
        REPLICAS = int(sys.argv[3])
    {"rel": gen_rel, "text": gen_text,
     "textsalt": lambda d: gen_text(d, salt=True)}[kind](outdir)
