#!/usr/bin/env python3
"""Dev-only scale-rehearsal corpus generator (NOT part of the library).

Replicates every /root/testdata/sf0.1 table FACTOR times with
FK-consistent key-domain strides, so the ×N corpus behaves like a
genuinely bigger dataset rather than FACTOR disjoint clones joined by
accident:

- customer/supplier/part/orders/lineitem/events keys stride by
  (replica · key_stride) on every key AND every foreign key, so joins
  stay 1:1-consistent and selectivities match the base corpus;
- nation/region are shared dimensions (schema-bounded — they do not
  grow at 100 TB either);
- documents get ONE token perturbed per replica (replica tag appended
  to the first whitespace token) so dedup selectivity stays realistic
  instead of collapsing to FACTOR-sized exact-dup cliques;
- embeddings replicate AS-IS: every vector gains FACTOR-1 identical
  twins — deliberately the ANN/dedup worst case (hot buckets).

Usage: python3 scripts/make_scale_corpus.py <outDir> <factor> [srcDir]
(the round-9/10 rehearsals: factor=10 → TPC-H ≈ sf1, lineitem 6M.)
"""
import sys
import duckdb

STRIDE = 10_000_000_000  # beyond any base key domain

def main(out_dir, factor, src="/root/testdata/sf0.1"):
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")
    reps = f"(SELECT unnest(range({factor})) AS rep)"

    def write(name, sql):
        con.execute(f"COPY ({sql}) TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}.parquet')").fetchone()[0]
        print(f"{name}: {n} rows")

    for t in ("region", "nation"):  # shared dims, copied once
        write(t, f"SELECT * FROM read_parquet('{src}/{t}.parquet')")

    write("customer", f"""
      SELECT c_custkey + rep*{STRIDE} AS c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM read_parquet('{src}/customer.parquet'), {reps}""")
    write("supplier", f"""
      SELECT s_suppkey + rep*{STRIDE} AS s_suppkey, s_name, s_nationkey, s_acctbal
      FROM read_parquet('{src}/supplier.parquet'), {reps}""")
    write("part", f"""
      SELECT p_partkey + rep*{STRIDE} AS p_partkey, p_name, p_brand, p_type,
             p_size, p_retailprice
      FROM read_parquet('{src}/part.parquet'), {reps}""")
    write("orders", f"""
      SELECT o_orderkey + rep*{STRIDE} AS o_orderkey,
             o_custkey + rep*{STRIDE} AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{src}/orders.parquet'), {reps}""")
    write("lineitem", f"""
      SELECT l_orderkey + rep*{STRIDE} AS l_orderkey,
             l_partkey + rep*{STRIDE} AS l_partkey,
             l_suppkey + rep*{STRIDE} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM read_parquet('{src}/lineitem.parquet'), {reps}""")
    write("events", f"""
      SELECT event_id + rep*{STRIDE} AS event_id, ts,
             user_id + rep*{STRIDE} AS user_id, event_type, value, props
      FROM read_parquet('{src}/events.parquet'), {reps}""")
    # one-token perturbation per replica: near-dups, not exact dups
    write("documents", f"""
      SELECT doc_id + rep*{STRIDE} AS doc_id,
             CASE WHEN rep = 0 THEN text
                  ELSE regexp_replace(text, '^(\\S+)', '\\1r' || rep) END AS text,
             lang, source,
             CAST(len(CASE WHEN rep = 0 THEN text
                  ELSE regexp_replace(text, '^(\\S+)', '\\1r' || rep) END) AS BIGINT) AS n_chars
      FROM read_parquet('{src}/documents.parquet'), {reps}""")
    write("embeddings", f"""
      SELECT vec_id + rep*{STRIDE} AS vec_id, embedding, label
      FROM read_parquet('{src}/embeddings.parquet'), {reps}""")

if __name__ == "__main__":
    out, factor = sys.argv[1], int(sys.argv[2])
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    import os
    os.makedirs(out, exist_ok=True)
    main(out, factor, src)
