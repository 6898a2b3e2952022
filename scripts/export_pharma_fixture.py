#!/usr/bin/env python3
"""Dev-only fixture exporter (run once; output is checked in).

Exports the reference's shipped staging DB (/root/reference/pharma.db,
read-only) to parquet test resources, preserving its quirks exactly:
duplicate txn_ids, unprefixed salestxn.rep_id, M/D/YYYY date strings,
and the original row order (rowid -> ingest_ord) so first-seen semantics
are testable. See SURVEY.md §1 / FIXTURES.md §A.
"""
import sqlite3

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/reference/pharma.db"
OUT = "src/test/resources/pharma"

con = sqlite3.connect(SRC)

def export(sql, name, schema):
    rows = con.execute(sql).fetchall()
    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    arrays = [pa.array(c, type=t) for c, (f, t) in zip(cols, schema)]
    table = pa.table(dict(zip([f for f, _ in schema], arrays)))
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(name, table.num_rows)

import os
os.makedirs(OUT, exist_ok=True)

export("SELECT rep_id, first_name, last_name, territory FROM reps ORDER BY rowid",
       "reps", [("rep_id", pa.string()), ("first_name", pa.string()),
                ("last_name", pa.string()), ("territory", pa.string())])
export("SELECT product_id, product_name FROM products ORDER BY rowid",
       "products", [("product_id", pa.int64()), ("product_name", pa.string())])
export("SELECT customer_id, customer_name, country FROM customers ORDER BY rowid",
       "customers", [("customer_id", pa.int64()), ("customer_name", pa.string()),
                     ("country", pa.string())])
export("""SELECT rowid AS ingest_ord, txn_id, product_id, rep_id, customer_id,
                 sale_date, sale_amount FROM salestxn ORDER BY rowid""",
       "salestxn", [("ingest_ord", pa.int64()), ("txn_id", pa.int64()),
                    ("product_id", pa.int64()), ("rep_id", pa.string()),
                    ("customer_id", pa.int64()), ("sale_date", pa.string()),
                    ("sale_amount", pa.float64())])
