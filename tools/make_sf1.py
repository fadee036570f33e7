#!/usr/bin/env python3
"""Synthesize an sf1-scale testdata dir (10x sf0.1) for the scaling sweep
(VERDICT r11 item 5 — the bench has never run above sf0.1).

The driver only ships sf{0.001,0.01,0.1}; this derives a 10x corpus from
sf0.1 DETERMINISTICALLY (no RNG), preserving referential integrity and —
for the text/dedup gates — realistic near-dup structure:

- fact/dim tables: 10 copies with every key column offset by
  copy * (max_key + 1) of its key space, so joins (orders->customer,
  lineitem->orders/part/supplier) stay consistent and group cardinalities
  scale 10x. nation/region stay fixed (they are the bounded dimensions).
- customer names: copies after the first are prefixed with a TWO-char
  per-copy tag ('aa', 'bb', ...) — both tag chars differ between copies,
  so cross-copy name pairs sit at edit distance >= 2 (and at a different
  length from copy 0) and are INVISIBLE to the dist<=1 fuzzy join; the
  within-copy typo-pair structure replicates, so fuzzy-join output scales
  ~LINEARLY with the corpus, like a real crawl's typo density. (The r12
  generator replicated c_name verbatim: every name gained 9 exact twins
  and the dist<=1 pair OUTPUT multiplied ~100x — the scaling sweep then
  measured the replication artifact, not the operator; VERDICT r12 #2.)
- documents: 10 copies with offset doc_ids; each copy's word sequence is
  deterministically reordered by md5(copy || word || position) so copies
  are NOT near-duplicates of each other (a verbatim copy would give every
  document 9 exact dups and quadratically explode every pair-mining gate
  — that would benchmark an artifact of the replication, not the
  operator), and ~1/16 of word POSITIONS per copy k>0 are mutated to a
  fresh per-copy token (word || copy digit, chosen by an independent md5
  bit) so the shingle VOCABULARY grows with the corpus instead of
  staying closed — the r12 closed vocabulary made posting-list df grow
  10x and the under-cap candidate mass grow ~99x (VERDICT r12 #2).
  Token COUNTS still scale exactly 10x (mutation substitutes, never
  inserts/deletes); word multisets are preserved up to the ~6% mutated
  positions.
- embeddings: 10 copies with offset vec_ids; each copy after the first
  gets a deterministic per-copy orthogonal-ish perturbation (rotate the
  component order by copy positions) so ANN structure is not 10
  coincident point sets.
- the PNG/WAV media formulas are doc_id-periodic (the dHash space
  saturates at 2,073 codes), so exact-duplicate media density GROWS with
  the corpus — retained DELIBERATELY as the duplicate-dense stress case
  the class-collapsed media miners must absorb (r13: measured 3.2-3.6x
  at 10x data, vs 47-192x before the collapse).

Usage: python3 tools/make_sf1.py [outdir] [copies]
  (defaults /tmp/graft_sf1, 10 copies = sf1; 30 copies = sf3 for the
   >10x probe-scaling point — same construction, so every per-copy
   property above holds at any copy count ≤ the embedding dim)
"""
import os, sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

def src(t):
    return f"'{SRC}/{t}.parquet'"

def write(t, sql):
    con.execute(f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")

# key-space sizes (offset units)
K = {}
for t, k in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
             ("part", "p_partkey"), ("orders", "o_orderkey"),
             ("events", "event_id"), ("documents", "doc_id"),
             ("embeddings", "vec_id")]:
    K[k] = con.execute(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0]

copies = f"unnest(generate_series(0, {COPIES - 1})) AS c(k)"

# fixed dimensions: straight copies
for t in ["region", "nation"]:
    write(t, f"SELECT * FROM {src(t)}")

write("customer", f"""
  SELECT c_custkey + k * {K['c_custkey']} AS c_custkey,
         CASE WHEN k = 0 THEN c_name
              ELSE chr(CAST(96 + k AS INTEGER)) || chr(CAST(96 + k AS INTEGER))
                   || c_name END AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM {src('customer')}, {copies}""")

write("supplier", f"""
  SELECT s_suppkey + k * {K['s_suppkey']} AS s_suppkey, s_name, s_nationkey,
         s_acctbal
  FROM {src('supplier')}, {copies}""")

write("part", f"""
  SELECT p_partkey + k * {K['p_partkey']} AS p_partkey, p_name, p_brand,
         p_type, p_size, p_retailprice
  FROM {src('part')}, {copies}""")

write("orders", f"""
  SELECT o_orderkey + k * {K['o_orderkey']} AS o_orderkey,
         o_custkey + k * {K['c_custkey']} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, {copies}""")

write("lineitem", f"""
  SELECT l_orderkey + k * {K['o_orderkey']} AS l_orderkey,
         l_partkey + k * {K['p_partkey']} AS l_partkey,
         l_suppkey + k * {K['s_suppkey']} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}, {copies}""")

write("events", f"""
  SELECT event_id + k * {K['event_id']} AS event_id, ts,
         user_id + k * 100000 AS user_id, event_type, value, props
  FROM {src('events')}, {copies}""")

# documents: per-copy deterministic word reorder (token-count-preserving)
# plus a ~1/16 per-position vocabulary mutation for copies k>0 — fresh
# shingle vocabulary per copy, so df and candidate-pair mass scale like a
# real growing crawl instead of a closed word set (VERDICT r12 #2)
write("documents", f"""
  WITH w AS (
    SELECT doc_id, k,
      CASE WHEN k > 0 AND md5('m' || CAST(k AS VARCHAR) || ':' || a[i] || ':'
                             || CAST(i AS VARCHAR)) LIKE '0%'
           THEN a[i] || CAST(k AS VARCHAR) ELSE a[i] END AS word,
      i AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS a FROM {src('documents')}),
         {copies},
         unnest(generate_series(1, len(a))) AS t(i)),
  reord AS (
    SELECT doc_id, k,
      string_agg(word, ' ' ORDER BY
        CASE WHEN k = 0 THEN lpad(CAST(pos AS VARCHAR), 8, '0')
             ELSE md5(CAST(k AS VARCHAR) || ':' || word || ':' || CAST(pos AS VARCHAR)) END,
        pos) AS text
    FROM w GROUP BY doc_id, k)
  SELECT r.doc_id + k * {K['doc_id']} AS doc_id, r.text,
         d.lang, d.source, CAST(length(r.text) AS BIGINT) AS n_chars
  FROM reord r JOIN {src('documents')} d ON d.doc_id = r.doc_id""")

# embeddings: rotate component order per copy (norm-preserving, no RNG)
write("embeddings", f"""
  SELECT vec_id + k * {K['vec_id']} AS vec_id,
         CASE WHEN k = 0 THEN embedding
              ELSE list_concat(embedding[k + 1:], embedding[:k]) END AS embedding,
         label
  FROM {src('embeddings')}, {copies}""")

print(f"done -> {OUT}")
