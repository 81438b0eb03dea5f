#!/usr/bin/env python3
"""Dev-only tooling (like local_check.py): build a null-bearing COPY of a
fixture dir to prove every registered query + oracle pair survives a
fixture regeneration that introduces NULL/empty text — the seam that has
broken green queries on past regenerations.

The copy symlinks every table except documents/embeddings/events, which
are rewritten with adversarial rows appended:
  - documents: NULL text (the judge-flagged divergence class), empty
    text, whitespace-only text, plus NULL lang / NULL source on those
    rows (grouping keys); and a non-ASCII row (accents, CJK, Cyrillic —
    the tokenizer/lower/length seam between Java and DuckDB)
  - embeddings: NULL vector, zero vector (cosine denominator 0), a
    NaN-component vector (NaN is non-null and != 0, so it needs its own
    guard conjunct — Spark orders NaN greatest, DuckDB's isnan filter
    drops it), NULL label
  - events: NULL ts (the round-6->7 breaker class), NULL event_type /
    value / props / user_id

Usage: python3 tools/make_null_fixture.py /root/testdata/sf0.001 <outDir>
Then:  sbt "runMain graft.Verify <outDir> target/verify_null_out"
       python3 tools/local_check.py <outDir> target/verify_null_out
"""
import os
import shutil
import sys

import duckdb

src, out = sys.argv[1], sys.argv[2]
os.makedirs(out, exist_ok=True)
for f in os.listdir(src):
    dst = os.path.join(out, f)
    if os.path.lexists(dst):
        if os.path.isdir(dst) and not os.path.islink(dst):
            shutil.rmtree(dst)
        else:
            os.remove(dst)
    if f not in ("documents.parquet", "embeddings.parquet", "events.parquet"):
        os.symlink(os.path.join(src, f), dst)

con = duckdb.connect()
base_max = con.sql(
    f"SELECT max(doc_id) FROM '{src}/documents.parquet'").fetchone()[0]
con.sql(f"""
  COPY (
    SELECT * FROM '{src}/documents.parquet'
    UNION ALL
    SELECT * FROM (VALUES
      ({base_max + 1}, NULL,        NULL, NULL,     0),
      ({base_max + 2}, '',          'en', NULL,     0),
      ({base_max + 3}, '   ',       NULL, 'webcrawl', 3),
      ({base_max + 4}, 'Crème brûlée naïve CAFÉ 日本語テスト тест ÅÄÖ',
       'de', 'books', 38)
    ) t(doc_id, text, lang, source, n_chars)
  ) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
n = con.sql(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
print(f"wrote {out}/documents.parquet with {n} rows "
      f"(3 adversarial null/empty rows appended)")

vec_max = con.sql(
    f"SELECT max(vec_id) FROM '{src}/embeddings.parquet'").fetchone()[0]
dim = con.sql(
    f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1").fetchone()[0]
con.sql(f"""
  COPY (
    SELECT * FROM '{src}/embeddings.parquet'
    UNION ALL
    SELECT {vec_max + 1}, NULL, NULL
    UNION ALL
    SELECT {vec_max + 2},
           CAST(list_transform(range({dim}), x -> 0.0) AS FLOAT[]), 0
    UNION ALL
    SELECT {vec_max + 3},
           CAST(list_transform(range({dim}),
                x -> CASE WHEN x = 0 THEN CAST('NaN' AS FLOAT)
                          ELSE 0.5 END) AS FLOAT[]), 1
    UNION ALL
    -- NULL COMPONENT (no NaN): a bare `isnan` conjunct is NULL (not
    -- false) for this vector under Spark's three-valued exists, while
    -- DuckDB's list_filter drops NULL predicate results — the engines
    -- would silently disagree on whether the row survives unless the
    -- guard's lambda (x IS NULL OR isnan(x)) is itself never NULL
    SELECT {vec_max + 4},
           CAST(list_transform(range({dim}),
                x -> CASE WHEN x = 1 THEN NULL
                          ELSE 0.25 END) AS FLOAT[]), 1
    UNION ALL
    -- INFINITY COMPONENT: Inf is non-null, nonzero, and NOT NaN, so it
    -- slips every earlier conjunct; its cosine is Inf/Inf = NaN (the
    -- NaN-is-greatest divergence again) and it must never reach a KMeans
    -- fit or an int8 quantizer — guarded engine-side by an
    -- abs(x) = +Inf conjunct and oracle-side by isinf(x)
    SELECT {vec_max + 5},
           CAST(list_transform(range({dim}),
                x -> CASE WHEN x = 2 THEN CAST('Infinity' AS FLOAT)
                          ELSE 0.75 END) AS FLOAT[]), 1
  ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")
n = con.sql(f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
print(f"wrote {out}/embeddings.parquet with {n} rows "
      f"(NULL-vector, zero-vector, NaN-, NULL-, and Inf-component rows appended)")

ev_max = con.sql(
    f"SELECT max(event_id) FROM '{src}/events.parquet'").fetchone()[0]
con.sql(f"""
  COPY (
    SELECT * FROM '{src}/events.parquet'
    UNION ALL
    SELECT * FROM (VALUES
      ({ev_max + 1}, NULL,
       7, 'click', 1.5, '{{"k": 1}}'),
      ({ev_max + 2}, TIMESTAMP '2024-01-01 00:30:00',
       NULL, NULL, NULL, NULL)
    ) t(event_id, ts, user_id, event_type, value, props)
  ) TO '{out}/events.parquet' (FORMAT PARQUET)
""")
n = con.sql(f"SELECT count(*) FROM '{out}/events.parquet'").fetchone()[0]
print(f"wrote {out}/events.parquet with {n} rows "
      f"(NULL-ts and NULL-field rows appended)")
