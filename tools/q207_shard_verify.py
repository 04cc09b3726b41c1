#!/usr/bin/env python3
"""q207 hash check at scales where the monolithic DuckDB replay is
disk-bound (sf3+): LegVerify-style decomposition. The per-byte sample
expansion is per-document independent, so the fingerprint `words`
table is built in doc shards (bounding DuckDB temp to one shard's
expansion), then the candidate/hamming tail -- SQL identical to the
monolithic oracle in ScalarQueries -- runs once over the materialized
words. Same integer arithmetic end to end, same sorted full-value
compare as tools/check_oracle.py.

Usage: tools/q207_shard_verify.py <sfDir> <verifyOutDir> [n_shards]
(run `tools/run.sh graft.Verify <sfDir> <out> q207_audio_fingerprint`
first).
"""
import sys
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
NSH = int(sys.argv[3]) if len(sys.argv) > 3 else 30
con = duckdb.connect()
con.execute("SET preserve_insertion_order=false")
import os
doc_path = f"{sf_dir}/documents.parquet"
if os.path.isdir(doc_path):  # Spark-written dir (ScaleUp fixtures)
    doc_path += "/*.parquet"
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{doc_path}'")
con.execute("CREATE TABLE words (doc_id BIGINT, word_idx BIGINT, word BIGINT)")
for s in range(NSH):
    con.execute(f"""
      INSERT INTO words
      WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n,
           hex(encode(text)) AS hx FROM documents WHERE doc_id % {NSH} = {s}),
      smp AS (SELECT doc_id, u.frame_idx, u.c FROM (
        SELECT doc_id, unnest(list_transform(range(0, n),
          i -> struct_pack(
            frame_idx := i // 32,
            c := (((CAST('0x' || substr(hx, CAST(2 * i + 1 AS INTEGER), 2)
              AS INTEGER) * 31 + i * 7) % 256) - 128) * 256))) AS u
        FROM b)),
      fe AS (SELECT doc_id, frame_idx, CAST(sum(c * c) AS BIGINT) AS e
        FROM smp GROUP BY doc_id, frame_idx),
      fb AS (SELECT doc_id, frame_idx,
          CASE WHEN lag(e) OVER (PARTITION BY doc_id ORDER BY frame_idx)
              IS NOT NULL
            AND e > lag(e) OVER (PARTITION BY doc_id ORDER BY frame_idx)
            THEN 1 ELSE 0 END AS bit
        FROM fe)
      SELECT doc_id, frame_idx // 16 AS word_idx,
          CAST(sum(bit * CAST(power(2, frame_idx % 16) AS BIGINT))
            AS BIGINT) AS word
      FROM fb GROUP BY doc_id, frame_idx // 16""")
    print(f"shard {s + 1}/{NSH}: total words "
          f"{con.sql('SELECT count(*) FROM words').fetchone()[0]}")

# candidate/hamming tail: SQL identical to the monolithic oracle in
# ScalarQueries, INCLUDING the round-14 multi-probe CTEs (single-bit
# flip neighbour keys, probe buckets capped like exact buckets)
want = con.sql("""
  WITH wcap AS (SELECT word_idx, word FROM words
      GROUP BY word_idx, word HAVING count(*) <= 64),
  wkept AS (SELECT w.* FROM words w JOIN wcap USING (word_idx, word)),
  probes0 AS (SELECT doc_id, word_idx,
      xor(word, CAST(1 AS BIGINT) << b) AS word
    FROM wkept, range(0, 16) t(b)),
  pcap AS (SELECT word_idx, word FROM probes0
      GROUP BY word_idx, word HAVING count(*) <= 64),
  pkept AS (SELECT p.* FROM probes0 p JOIN pcap USING (word_idx, word)),
  cands AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
    FROM wkept a JOIN wkept b
      ON a.word_idx = b.word_idx AND a.word = b.word
       AND a.doc_id < b.doc_id
    UNION
    SELECT DISTINCT least(p.doc_id, w.doc_id) AS doc1,
      greatest(p.doc_id, w.doc_id) AS doc2
    FROM pkept p JOIN wkept w
      ON p.word_idx = w.word_idx AND p.word = w.word
       AND p.doc_id <> w.doc_id),
  cm AS (SELECT doc1, doc2,
      CAST(count(*) AS BIGINT) AS n_common_words,
      CAST(sum(bit_count(xor(x.word, y.word))) AS BIGINT) AS hamc
    FROM cands
    JOIN words x ON x.doc_id = doc1
    JOIN words y ON y.doc_id = doc2 AND y.word_idx = x.word_idx
    GROUP BY doc1, doc2),
  nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nw
    FROM words GROUP BY doc_id)
  SELECT doc1, doc2, n_common_words,
    hamc + (n1.nw - n_common_words) * 16
      + (n2.nw - n_common_words) * 16 AS hamming,
    hamc + (n1.nw - n_common_words) * 16
      + (n2.nw - n_common_words) * 16 <= 8 AS is_dup
  FROM cm
  JOIN nw n1 ON n1.doc_id = doc1
  JOIN nw n2 ON n2.doc_id = doc2""").df()
got = con.sql(
    f"SELECT * FROM '{out_dir}/q207_audio_fingerprint/*.parquet'").df()
gc, wc = sorted(got.columns), sorted(want.columns)
assert gc == wc, (gc, wc)
got = got[gc].sort_values(gc).reset_index(drop=True)
want = want[wc].sort_values(wc).reset_index(drop=True)
assert len(got) == len(want), (len(got), len(want))
for c in gc:
    assert got[c].dtype.kind == want[c].dtype.kind, \
        (c, got[c].dtype, want[c].dtype)
    assert (got[c] == want[c]).all(), c
print(f"PASS q207_audio_fingerprint ({len(got)} rows)")
