#!/usr/bin/env python3
"""Validate gen_sfbig's generator-emitted doc_clusters truth labels
against the independent DuckDB recursive-CTE reachability form (the
q49/q110 oracle), at a scale where the CTE is feasible (sf0.1 and
below). Dev tooling only.

Usage: python3 tools/check_doc_clusters.py <dir-with-documents-and-doc_clusters>

Also the home of Q110_TRUTH_SQL — the sweep-side q110 oracle that
joins the truth labels instead of recursing (used by the at-scale
sweep where DuckDB's recursive CTE spills out of the sandbox; the
shipped SparkEntry.oracleSql keeps the recursive form, which is what
the driver's sf0.01 gate runs and what this script certifies the
truth labels against)."""
import sys
import duckdb

RECURSIVE_SQL = """
WITH RECURSIVE toks AS (
 SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS tk
 FROM documents),
sh AS (
 SELECT DISTINCT doc_id,
  unnest(list_transform(range(greatest(len(tk) - 1, 0)), i -> tk[i+1] || ' ' || tk[i+2])) AS shingle
 FROM toks),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
 SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
 FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
 GROUP BY 1, 2),
edges AS (
 SELECT doc_a, doc_b FROM inter
 JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
 WHERE CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.5),
sym AS (SELECT doc_a AS s, doc_b AS t FROM edges UNION ALL SELECT doc_b, doc_a FROM edges),
reach(node, lab) AS (
 SELECT doc_id, doc_id FROM documents
 UNION
 SELECT e.t, r.lab FROM reach r JOIN sym e ON e.s = r.node),
comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node)
SELECT doc_id, cluster_id FROM comp ORDER BY doc_id"""

# Sweep-side q110 oracle over the truth labels: same output contract as
# DedupQueries.q110Sql, no recursion, no shingle self-join.
Q110_TRUTH_SQL = """
WITH toks AS (
 SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS tk
 FROM documents),
m AS (
 SELECT c.doc_id, c.cluster_id, CAST(len(tk) AS BIGINT) AS quality
 FROM read_parquet('{dir}/doc_clusters.parquet') c JOIN toks USING (doc_id)),
best AS (
 SELECT cluster_id, doc_id AS best FROM (
  SELECT cluster_id, doc_id, row_number() OVER (PARTITION BY cluster_id ORDER BY quality DESC, doc_id) AS rn
  FROM m) WHERE rn = 1),
st AS (SELECT cluster_id, count(*) AS cluster_size FROM m GROUP BY cluster_id)
SELECT m.doc_id, m.cluster_id, m.quality, st.cluster_size,
 m.doc_id = best.best AS is_canonical,
 CAST(1000000 // st.cluster_size AS INT) AS weight_ppm
FROM m JOIN st USING (cluster_id) JOIN best USING (cluster_id)
ORDER BY m.doc_id"""


def main(d):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    truth = con.execute(
        f"SELECT doc_id, cluster_id FROM '{d}/doc_clusters.parquet' ORDER BY doc_id"
    ).fetchall()
    cte = con.execute(RECURSIVE_SQL).fetchall()
    if truth == cte:
        print(f"OK doc_clusters == recursive-CTE components ({len(truth)} docs)")
        return 0
    bad = [i for i, (a, b) in enumerate(zip(truth, cte)) if a != b][:5]
    print(f"MISMATCH: {len(truth)} vs {len(cte)} rows; first diffs at {bad}")
    for i in bad:
        print(f"  truth={truth[i]} cte={cte[i]}")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
