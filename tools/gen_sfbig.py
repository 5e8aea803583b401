#!/usr/bin/env python3
"""Deterministic scale-up of the driver's sf0.1 testdata for the
at-scale correctness sweep (VERDICT r3 "Next round" #4). Dev tooling
only — the shipped library has no Python dependency; the sweep just
needs SOME self-consistent parquet at ~sf1.0 that both Spark and the
DuckDB oracle read, so the sweep certifies engine agreement at 10x the
driver's largest fixture.

Construction (seed-deterministic, REP copies of sf0.1):

* region/nation: copied verbatim (fixed dimensions).
* customer/supplier/part/orders/lineitem/events: replicated with
  consistent key shifts (copy k shifts every PK and the FKs that
  reference it by k*maxkey), so referential structure and per-key
  densities match sf0.1 exactly.
* documents: replicated with per-copy text perturbation — each word of
  copy k>0 is independently replaced (p=0.3) by a vocab word chosen by
  a per-(copy,doc) RNG. Cross-copy shingle Jaccard drops to ~0.2, so
  the dedup operators see 10x the NATURAL near-dup density instead of a
  quadratic explosion of exact cross-copy duplicates; n_chars is
  recomputed (the sf0.1 invariant n_chars == len(text) holds).
* embeddings: copy k>0 gets fresh unit-normalized gaussian vectors
  (matching the sf0.1 distribution: 64-dim, unit norm) and labels from
  the same 0..9 range.
* doc_clusters: ground-truth connected components of the 2-gram-
  Jaccard>=0.5 graph over the emitted documents (the q49/q110 cluster
  semantics), computed here with exact integer set intersections +
  union-find. This is the generator-emitted truth that lets q110's
  sweep oracle be a plain join instead of DuckDB's recursive CTE
  (which spills >79 GB at sf0.3 — see BASELINE.md Addendum 2). The
  derivation is validated against the recursive-CTE form at sf0.1 by
  tools/check_doc_clusters.py.

Usage: python3 tools/gen_sfbig.py [REP] [OUTDIR]
  default REP=10 OUTDIR=target/testdata/sf1.0
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REP = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/testdata/sf1.0"

import os

os.makedirs(OUT, exist_ok=True)


def read(t):
    return pq.read_table(f"{SRC}/{t}.parquet")


def write(t, tbl):
    pq.write_table(tbl, f"{OUT}/{t}.parquet")
    print(f"[gen-sfbig] {t}: {tbl.num_rows} rows")


def shifted(tbl, shifts, k):
    """Copy k of tbl with each column in `shifts` bumped by k*base."""
    cols = {}
    for name in tbl.column_names:
        arr = tbl.column(name)
        if name in shifts:
            cols[name] = pa.compute.add(arr, k * shifts[name])
        else:
            cols[name] = arr
    return pa.table(cols)


def replicate(t, shifts):
    base = read(t)
    write(t, pa.concat_tables([shifted(base, shifts, k) for k in range(REP)]))


# fixed dims
for t in ("region", "nation"):
    write(t, read(t))

N_CUST, N_SUPP, N_PART, N_ORD = 15000, 1000, 20000, 150000
N_EVT, N_USER, N_DOC, N_VEC = 100000, 1500, 5000, 2000

replicate("customer", {"c_custkey": N_CUST})
replicate("supplier", {"s_suppkey": N_SUPP})
replicate("part", {"p_partkey": N_PART})
replicate("orders", {"o_orderkey": N_ORD, "o_custkey": N_CUST})
replicate("lineitem", {"l_orderkey": N_ORD, "l_partkey": N_PART, "l_suppkey": N_SUPP})
replicate("events", {"event_id": N_EVT, "user_id": N_USER})

# documents: perturbed replication
docs = read("documents")
texts = docs.column("text").to_pylist()
vocab = sorted({w for s in texts for w in s.split()})
parts = []
for k in range(REP):
    if k == 0:
        parts.append(docs)
        continue
    rng = np.random.RandomState(42_000 + k)
    new_texts = []
    for s in texts:
        ws = s.split()
        repl = rng.random_sample(len(ws)) < 0.3
        picks = rng.randint(0, len(vocab), size=len(ws))
        new_texts.append(
            " ".join(vocab[p] if r else w for w, r, p in zip(ws, repl, picks))
        )
    parts.append(
        pa.table(
            {
                "doc_id": pa.compute.add(docs.column("doc_id"), k * N_DOC),
                "text": pa.array(new_texts, pa.string()),
                "lang": docs.column("lang"),
                "source": docs.column("source"),
                "n_chars": pa.array([len(t) for t in new_texts], pa.int64()),
            }
        )
    )
all_docs = pa.concat_tables(parts)
write("documents", all_docs)


def doc_cluster_truth(doc_ids, doc_texts):
    """(doc_id, cluster_id) for every doc: connected components of the
    2-gram-shingle-Jaccard >= 0.5 graph, exactly the q110/q49 edge
    semantics (lowercase, split on [^a-z0-9]+, DISTINCT shingles, exact
    rational threshold — 2*inter >= union over integer set sizes, which
    is equivalent to the engines' double division by >= 0.5 because
    1/(2*union) exceeds the ulp of 0.5 for any feasible union). Docs
    with <2 tokens have empty shingle sets and form singletons (they
    never appear in the engines' `sh` CTE). Cost: one float32 GEMM per
    row block over the shingle universe — the 31-word vocab keeps the
    universe ~1e3, so sf1.0 (50k docs) is ~5e12 flops, a minute of
    BLAS, where the DuckDB recursive CTE spills out of the sandbox."""
    import re
    n = len(doc_ids)
    shingle_sets = []
    for t in doc_texts:
        tk = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        shingle_sets.append(frozenset(zip(tk, tk[1:])))
    universe = sorted(set().union(*shingle_sets))
    uidx = {s: i for i, s in enumerate(universe)}
    A = np.zeros((n, len(universe)), dtype=np.float32)
    for r, sh in enumerate(shingle_sets):
        for s in sh:
            A[r, uidx[s]] = 1.0
    sizes = A.sum(axis=1).astype(np.int64)
    parent = np.arange(n)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    blk = 4096
    for b0 in range(0, n, blk):
        b1 = min(b0 + blk, n)
        inter = np.rint(A[b0:b1] @ A.T).astype(np.int64)
        union = sizes[b0:b1, None] + sizes[None, :] - inter
        mask = (2 * inter >= union) & (union > 0)
        rows, cols = np.nonzero(mask)
        for r, c in zip(rows.tolist(), cols.tolist()):
            ra, rb = find(b0 + r), find(c)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    # cluster_id = min doc_id in the component (the engines' min-label)
    roots = np.array([find(i) for i in range(n)])
    ids = np.asarray(doc_ids, dtype=np.int64)
    order = np.argsort(ids)
    root_min = {}
    for i in order.tolist():  # ascending doc_id: first hit per root is min
        r = roots[i]
        if r not in root_min:
            root_min[r] = ids[i]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "cluster_id": pa.array([root_min[r] for r in roots.tolist()], pa.int64()),
        }
    )


write(
    "doc_clusters",
    doc_cluster_truth(
        all_docs.column("doc_id").to_pylist(), all_docs.column("text").to_pylist()
    ),
)

# embeddings: fresh unit-norm gaussians for copies
emb = read("embeddings")
parts = [emb]
for k in range(1, REP):
    rng = np.random.RandomState(77_000 + k)
    v = rng.standard_normal((N_VEC, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    parts.append(
        pa.table(
            {
                "vec_id": pa.compute.add(emb.column("vec_id"), k * N_VEC),
                "embedding": pa.array([row for row in v.tolist()], pa.list_(pa.float32())),
                "label": pa.array(rng.randint(0, 10, size=N_VEC), pa.int32()),
            }
        )
    )
write("embeddings", pa.concat_tables(parts))
print(f"[gen-sfbig] done -> {OUT}")
