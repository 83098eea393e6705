#!/usr/bin/env python3
"""Build a deterministic Fx scale slice of an sf dir for the scale probe
(BENCH_SCALE.json): documents, embeddings and events are replicated F
times, other tables symlinked.

Recipe (same family as the r9 10x probe):
  - documents: doc_id' = doc_id*1000 + i (i in 0..F-1). Copy 0 keeps the
    original text; copy i>0 rewrites every 3rd word to word||'~'||i, so
    copies are NOT mutual near-dups of each other or of the original —
    the true near-dup pair output stays ~linear in F and the probe
    measures engine scaling, not an inflated quadratic result set.
  - embeddings: vec_id' = vec_id*1000 + i; per-component deterministic
    jitter x + ((i*31 + comp) % 7 - 3) * 1e-3 keeps copies spread out so
    ANN candidate sets scale like a genuinely bigger corpus.
  - events: event_id' = event_id*1000 + i, user_id' = user_id*1000 + i,
    ts unchanged — F times the users in the same time range, so
    watermark/sessionization/attribution state scales linearly while the
    arrival order (event_id) stays a valid global sequence.

usage: make_scale_slice.py <src_sf_dir> <out_dir> <factor>
"""
import duckdb, os, sys

src, out, F = sys.argv[1], sys.argv[2], int(sys.argv[3])
assert 1 < F <= 1000
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT d.doc_id * 1000 + i.i AS doc_id,
         CASE WHEN i.i = 0 THEN d.text
              ELSE array_to_string(
                list_transform(string_split(d.text, ' '),
                  (w, j) -> CASE WHEN (j - 1) % 3 = 0
                                 THEN w || '~' || i.i ELSE w END), ' ')
         END AS text,
         d.lang, d.source,
         CAST(length(CASE WHEN i.i = 0 THEN d.text
              ELSE array_to_string(
                list_transform(string_split(d.text, ' '),
                  (w, j) -> CASE WHEN (j - 1) % 3 = 0
                                 THEN w || '~' || i.i ELSE w END), ' ')
              END) AS BIGINT) AS n_chars
  FROM '{src}/documents.parquet' d, range(0, {F}) i(i)
  ORDER BY doc_id
) TO '{out}/documents.parquet' (FORMAT parquet)""")
con.execute(f"""
COPY (
  SELECT e.vec_id * 1000 + i.i AS vec_id,
         CASE WHEN i.i = 0 THEN e.embedding
              ELSE list_transform(e.embedding,
                (x, c) -> CAST(x + ((i.i * 31 + c - 1) % 7 - 3) * 0.001
                               AS FLOAT))
         END AS embedding,
         e.label
  FROM '{src}/embeddings.parquet' e, range(0, {F}) i(i)
  ORDER BY vec_id
) TO '{out}/embeddings.parquet' (FORMAT parquet)""")
con.execute(f"""
COPY (
  SELECT e.event_id * 1000 + i.i AS event_id, e.ts,
         e.user_id * 1000 + i.i AS user_id,
         e.event_type, e.value, e.props
  FROM '{src}/events.parquet' e, range(0, {F}) i(i)
  ORDER BY event_id
) TO '{out}/events.parquet' (FORMAT parquet)""")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]:
    dst = f"{out}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{src}/{t}.parquet", dst)
print(f"wrote {out} at {F}x:",
      con.execute(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0],
      "docs,",
      con.execute(f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0],
      "vecs")
