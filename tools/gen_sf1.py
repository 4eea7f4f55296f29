#!/usr/bin/env python
"""Generate a local sf1 fixture set (10x sf0.1) for the SCALING.md ladder.

The driver provides sf0.001/0.01/0.1 only; sf1 is derived by replicating
sf0.1 ten times with key offsets — same schemas (duckdb COPY preserves
physical types, incl. events' TIMESTAMP-us), same value distributions,
10x the rows. events keep their time range but gain 10x density (ts
jittered by k*7us so copies never tie exactly); ids offset per copy.
Output: target/sf1/*.parquet (NOT committed; /root/testdata is read-only).

Honest-methodology note for the ladder: replication gives exact-duplicate
families of 10 across copies, which the driver generator does not have —
fine for the cost curves measured here (q54-family pair counts are
vocabulary-driven and already dense), but don't use this set to study
exact-dedup selectivity.
"""
import os
import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(__file__), "..", "target", "sf1")
os.makedirs(DST, exist_ok=True)

con = duckdb.connect()

def copy(sql, name):
    out = os.path.join(DST, f"{name}.parquet")
    con.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{name}: {n} rows")

# small dims: verbatim
for t in ["region", "nation"]:
    copy(f"SELECT * FROM '{SRC}/{t}.parquet'", t)

# keyed tables: 10 copies with offset keys
copy(f"""SELECT c_custkey + k.k * 20000 AS c_custkey, c_name, c_nationkey,
                c_acctbal, c_mktsegment
         FROM '{SRC}/customer.parquet', range(10) k(k)""", "customer")
copy(f"""SELECT s_suppkey + k.k * 2000 AS s_suppkey, s_name, s_nationkey,
                s_acctbal
         FROM '{SRC}/supplier.parquet', range(10) k(k)""", "supplier")
copy(f"""SELECT p_partkey + k.k * 30000 AS p_partkey, p_name, p_brand,
                p_type, p_size, p_retailprice
         FROM '{SRC}/part.parquet', range(10) k(k)""", "part")
copy(f"""SELECT o_orderkey + k.k * 1000000 AS o_orderkey,
                o_custkey + k.k * 20000 AS o_custkey,
                o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
         FROM '{SRC}/orders.parquet', range(10) k(k)""", "orders")
copy(f"""SELECT l_orderkey + k.k * 1000000 AS l_orderkey,
                l_partkey + k.k * 30000 AS l_partkey,
                l_suppkey + k.k * 2000 AS l_suppkey,
                l_linenumber, l_quantity, l_extendedprice, l_discount,
                l_tax, l_returnflag, l_linestatus, l_shipdate
         FROM '{SRC}/lineitem.parquet', range(10) k(k)""", "lineitem")

# events: same range, 10x density (jitter keeps timestamps unique-ish)
copy(f"""SELECT event_id + k.k * 100000 AS event_id,
                ts + k.k * INTERVAL 7 MICROSECOND AS ts,
                user_id + k.k * 2000 AS user_id,
                event_type, "value", props
         FROM '{SRC}/events.parquet', range(10) k(k)""", "events")

copy(f"""SELECT doc_id + k.k * 5000 AS doc_id, text, lang, source, n_chars
         FROM '{SRC}/documents.parquet', range(10) k(k)""", "documents")
copy(f"""SELECT vec_id + k.k * 2000 AS vec_id, embedding, label
         FROM '{SRC}/embeddings.parquet', range(10) k(k)""", "embeddings")

print("done ->", os.path.abspath(DST))
