#!/usr/bin/env python3
"""At-scale sweep gate for q110: patch the dumped oracle_sql.json so
q110 rides the generator-emitted truth labels (doc_clusters.parquet,
validated against the recursive-CTE form by check_doc_clusters.py)
instead of the recursive CTE that spills out of the sandbox at sf0.3+,
then run the standard tools/compare.py hash gate for it. Dev tooling
only — the shipped SparkEntry.oracleSql keeps the recursive form (the
driver's sf0.01 gate).

Usage: python3 tools/sweep_q110.py <sfdir> <outdir>
"""
import sys
import os
import json

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_doc_clusters import Q110_TRUTH_SQL  # noqa: E402
import compare  # noqa: E402


def main(sfdir, outdir):
    p = f"{outdir}/oracle_sql.json"
    j = json.load(open(p))
    j["q110_canonical_dedup"] = Q110_TRUTH_SQL.format(dir=sfdir)
    json.dump(j, open(p, "w"))
    return compare.main(sfdir, outdir, {"q110_canonical_dedup"})


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
