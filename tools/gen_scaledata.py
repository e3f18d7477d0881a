#!/usr/bin/env python3
"""Generate scaled (sf1 / sf5) fixtures for the scale-stress runs.

The driver's testdata stops at sf0.1; the scale proof needs 10x and 50x
row counts with the SAME structural properties so s/query curves measure
the engine, not a changed workload:

  customer   Customer#%09d names over a larger key range -- the
             edit-distance neighbor structure (names differing in one
             digit) scales linearly with rows by construction.
  orders     uniform keys/status/price/date over the larger range.
  lineitem   uniform fact rows over the larger dimensions.
  documents  random word salads from the sf vocab, with ~0.5% planted
             near-duplicates (1-2 word substitutions of an earlier doc)
             -- linear near-dup pair structure, matching the measured
             sf0.1 density (25 LSH pairs / 5000 docs).
  embeddings unit-norm iid gaussian 64-dim vectors, labels uniform --
             measured sf0.1 structure (labels carry no cosine signal;
             chance cos>=0.3 ~ 0.7%, candidate generation is bucket-
             capped so work scales with rows).

Unused tables (nation/region/part/supplier/events) are symlinked from
the read-only sf0.1 so every Tables.* accessor resolves.

Usage: python3 tools/gen_scaledata.py [outbase]   (default /tmp/scaledata)
Writes outbase/sf1 and outbase/sf5; also symlinks outbase/sf0.001 to the
driver's sf0.001 so graft.Bench's warmup pass resolves.
"""
import os
import sys
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TESTDATA = "/root/testdata"
VOCAB = ("batch part spark line column order small sort fast query agg table "
         "vector scan stream hash filter customer value big merge group a the "
         "slow join shuffle key row file").split()


def gen_sql_tables(con, out, n_cust, n_orders, n_line):
    con.execute("SELECT setseed(0.42)")
    con.execute(f"""
        COPY (SELECT i AS c_custkey,
                     printf('Customer#%09d', i) AS c_name,
                     (random()*25)::INTEGER AS c_nationkey,
                     round(random()*9000 + 1000, 2) AS c_acctbal,
                     ['FURNITURE','MACHINERY','AUTOMOBILE','BUILDING','HOUSEHOLD'][(random()*5)::INTEGER + 1] AS c_mktsegment
              FROM range({n_cust}) t(i))
        TO '{out}/customer.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT i AS o_orderkey,
                     (random()*{n_cust})::BIGINT AS o_custkey,
                     ['O','F','P'][(random()*3)::INTEGER + 1] AS o_orderstatus,
                     round(random()*400000 + 1000, 2) AS o_totalprice,
                     TIMESTAMP '1995-01-01' + INTERVAL ((random()*2557)::INTEGER) DAY AS o_orderdate,
                     ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'][(random()*5)::INTEGER + 1] AS o_orderpriority
              FROM range({n_orders}) t(i))
        TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT (random()*{n_orders})::BIGINT AS l_orderkey,
                     (random()*{max(200000, n_cust)})::BIGINT AS l_partkey,
                     (random()*10000)::BIGINT AS l_suppkey,
                     ((random()*7)::INTEGER + 1) AS l_linenumber,
                     ((random()*50)::INTEGER + 1)::DOUBLE AS l_quantity,
                     round(random()*90000 + 1000, 2) AS l_extendedprice,
                     round(random()*0.1, 2) AS l_discount,
                     round(random()*0.08, 2) AS l_tax,
                     ['A','N','R'][(random()*3)::INTEGER + 1] AS l_returnflag,
                     ['O','F'][(random()*2)::INTEGER + 1] AS l_linestatus,
                     TIMESTAMP '1995-01-01' + INTERVAL ((random()*2557)::INTEGER) DAY AS l_shipdate
              FROM range({n_line}) t(i))
        TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")


def gen_documents(out, n_docs, rng):
    texts, langs, sources = [], [], []
    lang_pool = ["en"] * 7 + ["zh", "de", "fr"]
    for i in range(n_docs):
        if i > 100 and rng.random() < 0.005:
            # planted near-dup: substitute 1-2 words of an earlier doc
            base = texts[rng.integers(0, i - 1)].split()
            for _ in range(rng.integers(1, 3)):
                base[rng.integers(0, len(base))] = VOCAB[rng.integers(0, len(VOCAB))]
            words = base
        else:
            n = rng.integers(15, 60)
            words = [VOCAB[rng.integers(0, len(VOCAB))] for _ in range(n)]
        texts.append(" ".join(words))
        langs.append(lang_pool[rng.integers(0, len(lang_pool))])
        sources.append(f"src{rng.integers(0, 20)}")
    t = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    pq.write_table(t, f"{out}/documents.parquet")


def gen_embeddings(out, n_vecs, rng):
    E = rng.standard_normal((n_vecs, 64)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    t = pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array([v.tolist() for v in E],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vecs), pa.int32()),
    })
    pq.write_table(t, f"{out}/embeddings.parquet")


def link_rest(out):
    for name in ("nation", "region", "part", "supplier", "events"):
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{TESTDATA}/sf0.1/{name}.parquet", dst)


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaledata"
    os.makedirs(base, exist_ok=True)
    warm = f"{base}/sf0.001"
    if not os.path.exists(warm):
        os.symlink(f"{TESTDATA}/sf0.001", warm)
    for sf, mult in (("sf1", 10), ("sf5", 50)):
        out = f"{base}/{sf}"
        if os.path.exists(f"{out}/lineitem.parquet"):
            print(f"{out}: exists, skipping")
            continue
        os.makedirs(out, exist_ok=True)
        print(f"generating {out} ({mult}x sf0.1) ...")
        con = duckdb.connect()
        gen_sql_tables(con, out,
                       n_cust=15000 * mult,
                       n_orders=150000 * mult,
                       n_line=600000 * mult)
        rng = np.random.default_rng(42)
        gen_documents(out, 5000 * mult, rng)
        gen_embeddings(out, 2000 * mult, rng)
        link_rest(out)
        print(f"{out}: done")


if __name__ == "__main__":
    main()
