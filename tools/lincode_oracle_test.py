#!/usr/bin/env python3
"""Test the DuckDB recursive-CTE lincode oracle against lincode_replay.py."""
import subprocess
import sys
import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# %identity over shared non-missing loci, as a pure list expression over two
# VARCHAR[] profiles (missing = '0', 'N' matches anything) — IEEE double ops
# in the same order as the Scala identityPct.
def PCT(a, b):
    comparable = (f"len(list_filter(list_zip({a}, {b}), "
                  f"p -> p[1] <> '0' AND p[2] <> '0'))")
    shared = (f"len(list_filter(list_zip({a}, {b}), "
              f"p -> p[1] <> '0' AND p[2] <> '0' AND "
              f"(p[1] = p[2] OR p[1] = 'N' OR p[2] = 'N')))")
    return (f"CASE WHEN {comparable} = 0 THEN 0.0 "
            f"ELSE CAST(100 AS DOUBLE) * {shared} / {comparable} END")

SQL = f"""
WITH RECURSIVE
des AS (
  SELECT l_orderkey AS id, CAST(l_linenumber AS INT) AS locus,
         min(CAST(l_suppkey AS VARCHAR)) AS a
  FROM lineitem WHERE l_orderkey < 300 GROUP BY 1, 2),
profs AS (
  SELECT id, list_transform([1, 2, 3, 4, 5, 6, 7],
                            i -> coalesce(m[i][1], '0')) AS prof
  FROM (SELECT id, map(list(locus ORDER BY locus),
                       list(a ORDER BY locus)) AS m
        FROM des GROUP BY id)),
ordered AS (
  SELECT list(struct_pack(id := id, prof := prof) ORDER BY id) AS p
  FROM profs),
assign AS (
  SELECT 1 AS n,
         [struct_pack(id := p[1].id, prof := p[1].prof,
                      code := [0, 0, 0])] AS st,
         p[2:] AS rest
  FROM ordered
  UNION ALL
  SELECT n + 1,
         list_append(st, struct_pack(
           id := rest[1].id, prof := rest[1].prof, code :=
           CASE WHEN d >= 3 THEN b.code
                ELSE [CASE WHEN d >= 1 THEN b.code[1] ELSE v END,
                      CASE WHEN d >= 2 THEN b.code[2]
                           WHEN d = 1 THEN v ELSE 0 END,
                      CASE WHEN d = 2 THEN v ELSE 0 END]
           END)),
         rest[2:]
  FROM (
    SELECT n, st, rest, b, d,
           1 + list_max(list_transform(
                 list_filter(st, x -> x.code[1:d] = b.code[1:d]),
                 x -> x.code[d + 1])) AS v
    FROM (
      SELECT n, st, rest, b,
             CAST(-b.np >= 30.0 AS INT) + CAST(-b.np >= 60.0 AS INT)
             + CAST(-b.np >= 90.0 AS INT) AS d
      FROM (
        SELECT n, st, rest,
               list_sort(list_transform(st, x -> struct_pack(
                 np := -({PCT("rest[1].prof", "x.prof")}),
                 id := x.id, code := x.code)))[1] AS b
        FROM assign WHERE len(rest) > 0) q1) q2) q3)
SELECT u.id AS l_orderkey,
       concat_ws('_', u.code[1], u.code[2], u.code[3]) AS lincode
FROM (SELECT st FROM assign ORDER BY n DESC LIMIT 1) f, unnest(f.st) AS t(u)
ORDER BY l_orderkey
"""

con = duckdb.connect()
con.execute(
    f"CREATE VIEW lineitem AS SELECT * FROM '{SFDIR}/lineitem.parquet'")
sql_rows = [f"{r[0]},{r[1]}" for r in con.execute(SQL).fetchall()]

replay = subprocess.run(
    [sys.executable, "tools/lincode_replay.py", SFDIR],
    capture_output=True, text=True, check=True).stdout.strip().splitlines()

if sql_rows == replay:
    print(f"MATCH: {len(sql_rows)} rows")
else:
    print(f"MISMATCH: sql={len(sql_rows)} replay={len(replay)}")
    n = 0
    for a, b in zip(sql_rows, replay):
        if a != b:
            print(f"  sql={a}  replay={b}")
            n += 1
            if n > 10:
                break
    sys.exit(1)
