#!/usr/bin/env python3
"""Dev-only scale amplifier (NOT part of the engine): replicate a
driver-generated sf dir N x into a new dir for robustness replays at
scales the driver does not ship (e.g. sf1 = 10 x sf0.1).

  python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/sf1 10

Deterministic (no RNG): copy i offsets every surrogate key by
i * (max_key + 1), preserving referential integrity (orders->customer,
lineitem->orders/part/supplier, events->user). Dims region/nation are
fixed-cardinality and copied as-is. documents text is token-suffixed
per copy ("word" -> "wordq3") so each copy keeps sf0.1's intra-copy
duplication structure WITHOUT turning every doc into a 10-way exact
dup across copies (which would degenerate the dedup operators).
events keeps its parquet timestamp[ns] physical type (the engine's
Tables.events contract) by amplifying through pyarrow, not SQL.
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def main(src: str, dst: str, n: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def stride(table: str, key: str) -> int:
        return con.execute(
            f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

    def write_union(name: str, per_copy_sql) -> None:
        sql = "\nUNION ALL\n".join(per_copy_sql(i) for i in range(n))
        con.sql(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        print(name, con.execute(
            f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0])

    # fixed-cardinality dims: verbatim
    for name in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{src}/{name}.parquet') "
                f"TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        print(name, "copied")

    ck, sk, pk, ok = (stride("customer", "c_custkey"), stride("supplier", "s_suppkey"),
                      stride("part", "p_partkey"), stride("orders", "o_orderkey"))

    write_union("customer", lambda i: f"""
      SELECT c_custkey + {i * ck} AS c_custkey, c_name, c_nationkey, c_acctbal,
             c_mktsegment FROM '{src}/customer.parquet'""")
    write_union("supplier", lambda i: f"""
      SELECT s_suppkey + {i * sk} AS s_suppkey, s_name, s_nationkey, s_acctbal
      FROM '{src}/supplier.parquet'""")
    write_union("part", lambda i: f"""
      SELECT p_partkey + {i * pk} AS p_partkey, p_name, p_brand, p_type, p_size,
             p_retailprice FROM '{src}/part.parquet'""")
    write_union("orders", lambda i: f"""
      SELECT o_orderkey + {i * ok} AS o_orderkey, o_custkey + {i * ck} AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM '{src}/orders.parquet'""")
    write_union("lineitem", lambda i: f"""
      SELECT l_orderkey + {i * ok} AS l_orderkey, l_partkey + {i * pk} AS l_partkey,
             l_suppkey + {i * sk} AS l_suppkey, l_linenumber, l_quantity,
             l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
             l_shipdate FROM '{src}/lineitem.parquet'""")

    dk = stride("documents", "doc_id")
    # copy 0 is sf0.1 verbatim; copy i>0 suffixes every token with q<i>
    # (disjoint vocabularies per copy -> no cross-copy shingle overlap)
    write_union("documents", lambda i: f"""
      SELECT doc_id + {i * dk} AS doc_id, text, lang, source, n_chars
      FROM '{src}/documents.parquet'""" if i == 0 else f"""
      SELECT doc_id + {i * dk} AS doc_id,
             array_to_string(list_transform(string_split(text, ' '),
               x -> x || 'q{i}'), ' ') AS text,
             lang, source,
             length(array_to_string(list_transform(string_split(text, ' '),
               x -> x || 'q{i}'), ' ')) AS n_chars
      FROM '{src}/documents.parquet'""")

    vk = stride("embeddings", "vec_id")
    write_union("embeddings", lambda i: f"""
      SELECT vec_id + {i * vk} AS vec_id, embedding, label
      FROM '{src}/embeddings.parquet'""")

    # events: pyarrow path to preserve the timestamp[ns] physical type
    ev = pq.read_table(f"{src}/events.parquet")
    ek = pc.max(ev.column("event_id")).as_py() + 1
    uk = pc.max(ev.column("user_id")).as_py() + 1
    copies = []
    for i in range(n):
        t = ev
        t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                         pc.add(t.column("event_id"), i * ek))
        t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                         pc.add(t.column("user_id"), i * uk))
        copies.append(t)
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/events.parquet")
    print("events", out.num_rows, out.schema.field("ts").type)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
