#!/usr/bin/env python
"""Generate a local sf1 fixture set (10x sf0.1) for the SCALING.md ladder.

The driver provides sf0.001/0.01/0.1 only; sf1 is derived by replicating
sf0.1 ten times with key offsets — same schemas (duckdb COPY preserves
physical types, incl. events' TIMESTAMP-us), same value distributions,
10x the rows.

Diversified text (round 6): naive 10x replication made every copy-family
mutually near-dup, inflating pair-operator outputs ~100x (SCALING.md
par.8.1's caveat). Copies k>0 now get a deterministic per-copy VOCABULARY
CIPHER: when md5(t:k) % 100 < 40, token t is rewritten through a per-copy
substitution cipher (lowercase alphabet -> UPPERCASE alphabet rotated by
7k). The cipher is LENGTH-PRESERVING and globally injective (per-char
bijection; the fixture corpus is all-lowercase, so ciphered tokens can
never equal an un-ciphered one), and the selection is keyed by (token,
copy) — not by doc — so it applies consistently across all docs of a
copy. Consequences, verified in-round: intra-copy near-dup structure is
EXACTLY preserved (token/shingle jaccard unchanged AND q54's
char-length-band blocking unchanged — an earlier suffix-append variant
inflated lengths and silently dropped ~20% of intra-copy pairs through
the length bands), while inter-copy token overlap drops to ~36% (jaccard
~0.15, far below every near-dup threshold in the battery). Near-dup
selectivity at sf1 therefore matches sf0.1 (10x the docs, ~10x the
pairs), which is what a real 10x-bigger corpus looks like. n_chars is
unchanged (lengths preserved). Copy 0 stays verbatim.

events: jitter is k * 1 ms (was k*7us, which put all 10 replicas of an
event in the same millisecond + event_type — violating the (event_type,
ms) no-collision invariant fixture_check enforces for the ingest
round-trip oracles q45/q47/q278-q281). 1 ms shifts keep ms-truncation
distinct WITHIN a replica family; cross-family collisions (two same-type
source events exactly d ms apart, d in 1..9) left ~41 residuals — and no
constant jitter step eliminates them (measured: every candidate delta
from 1 ms to ~10 s leaves 3-9 colliding source pairs, the stream is that
dense). So a deterministic REPAIR pass follows the copy: each residual
(event_type, ms) group keeps its lowest-event_id row and shifts the
others by rank * 17471 ms, re-checking until zero (converges in 1-2
passes; worst-case drift per repaired row is a few minutes on a 90-day
stream — irrelevant to the ladder's distributions). The script exits
non-zero if residuals remain, so sf1 is now a GATE-grade fixture for the
ingest round-trip oracles, not just a timing ladder.

Output: target/sf1/*.parquet (NOT committed; /root/testdata is read-only).

Honest-methodology note for the ladder: the renaming changes the token
VOCABULARY of copies k>0 (suffixed tokens are not stopwords, so
langid/stopword-ratio distributions shift in perturbed copies); length
and shingle-count distributions are preserved. Fine for dedup/pair cost
curves — that is what this set exists for.
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

# events: same range, 10x density; k*1ms jitter keeps ms-truncated copies
# of one source event distinct (see module docstring)
copy(f"""SELECT event_id + k.k * 100000 AS event_id,
                ts + k.k * INTERVAL 1 MILLISECOND AS ts,
                user_id + k.k * 2000 AS user_id,
                event_type, "value", props
         FROM '{SRC}/events.parquet', range(10) k(k)""", "events")

def event_collisions():
    return con.sql(f"""
        SELECT count(*) FROM (
          SELECT event_type, date_trunc('millisecond', ts) AS ms
          FROM '{DST}/events.parquet' GROUP BY 1, 2 HAVING count(*) > 1)
        """).fetchone()[0]

# deterministic repair: within each colliding (event_type, ms) group, keep
# the lowest event_id and shift the rest by rank * 17471 ms (see docstring)
ncoll = event_collisions()
passes = 0
while ncoll > 0 and passes < 5:
    # stage to a sibling file: COPY must not truncate its own input
    con.sql(f"""
        COPY (
          WITH ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY event_type, date_trunc('millisecond', ts)
                ORDER BY event_id) - 1 AS rnk
            FROM '{DST}/events.parquet')
          SELECT event_id, ts + rnk * INTERVAL 17471 MILLISECOND AS ts,
                 user_id, event_type, "value", props
          FROM ranked
        ) TO '{DST}/events_repair.parquet' (FORMAT PARQUET)""")
    os.replace(f"{DST}/events_repair.parquet", f"{DST}/events.parquet")
    passes += 1
    ncoll = event_collisions()
    print(f"events collision repair pass {passes}: {ncoll} residual")
print(f"events (event_type, ms) residual collisions: {ncoll}")
if ncoll > 0:
    raise SystemExit("sf1 events still collide — ingest oracles would flake")

# documents: copy 0 verbatim; copies 1..9 vocabulary-ciphered (docstring)
lower = "abcdefghijklmnopqrstuvwxyz"
upper = lower.upper()
rot = {k: upper[7 * k % 26:] + upper[:7 * k % 26] for k in range(1, 10)}
cipher_cases = " ".join(
    f"WHEN k.k = {k} THEN translate(t, '{lower}', '{rot[k]}')"
    for k in range(1, 10))
copy(f"""SELECT doc_id + k.k * 5000 AS doc_id,
                CASE WHEN k.k = 0 THEN text ELSE array_to_string(
                  list_transform(string_split_regex(trim(text), '\\s+'),
                    t -> CASE WHEN ('0x' || substr(md5(t || ':' || k.k), 1, 8))::BIGINT % 100 < 40
                         THEN CASE {cipher_cases} ELSE t END
                         ELSE t END), ' ') END AS text,
                lang, source, n_chars
         FROM '{SRC}/documents.parquet', range(10) k(k)""", "documents")

copy(f"""SELECT vec_id + k.k * 2000 AS vec_id, embedding, label
         FROM '{SRC}/embeddings.parquet', range(10) k(k)""", "embeddings")

print("done ->", os.path.abspath(DST))
