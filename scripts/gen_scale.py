"""Generate a larger scale factor by replicating a driver-generated sf dir.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md); the round-3 verdict asks
for a scale rehearsal at ~10x the bench scale.  /root/testdata is
read-only, so the scaled copy lives under the repo (gitignored).

Scaling model — "disjoint shards with shared dimensions":

* ``region``/``nation`` are copied once (true dimension tables; at any
  TPC-H scale factor they stay 5/25 rows).
* Every fact/entity table is replicated FACTOR times with all
  primary/foreign keys offset by ``replica * 10_000_000`` (every sf0.1
  key is < 10M).  Foreign keys stay consistent *within* a replica, so
  per-entity cardinalities (orders per customer, events per user,
  lineitems per order) match the source distribution — join fan-outs
  scale linearly, not quadratically.
* ``documents``: replica 0 is verbatim; in replica i>0 every 3rd token
  is rewritten to a replica-tagged token.  In-replica duplicate/near-dup
  structure is preserved exactly (the rewrite is a pure function of
  (replica, position)), while cross-replica 8-gram Jaccard collapses to
  ~0 — so near-dup pair counts scale linearly instead of exploding
  quadratically in the replica count, which is what a real corpus 10x
  the size would do.
* ``embeddings``: replica 0 is verbatim; replica i>0 mixes each unit
  vector with an independent per-(replica, vec_id) random unit vector at
  cos ~ 0.35 to the original — below every similarity threshold in the
  registry (COS_THRESHOLD=0.4, DUP_COS=0.55), so candidate-pair volumes
  scale with corpus size, not replica count squared.

Usage: python scripts/gen_scale.py [--src /root/testdata/sf0.1]
       [--dst .scaledata/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

OFF = 10_000_000  # per-replica key offset; every sf0.1 key is < 10M

# fact tables scaled via duckdb: {table: [key columns to offset]}
FACT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
DIMS = ["region", "nation"]


def scale_facts(src: str, dst: str, factor: int) -> None:
    con = duckdb.connect()
    for table, keys in FACT_KEYS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"describe select * from '{src}/{table}.parquet'"
            ).fetchall()
        ]
        branches = []
        for i in range(factor):
            sel = ", ".join(
                f"({c} + {i * OFF}) AS {c}" if c in keys else c for c in cols
            )
            branches.append(f"SELECT {sel} FROM '{src}/{table}.parquet'")
        union = " UNION ALL ".join(branches)
        con.sql(
            f"COPY ({union}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {table}: x{factor}")


def perturb_documents(src: str, dst: str, factor: int) -> None:
    df = pd.read_parquet(f"{src}/documents.parquet")
    out = []
    for i in range(factor):
        rep = df.copy()
        rep["doc_id"] = rep["doc_id"] + i * OFF
        if i > 0:
            # replace every 3rd token with a (replica, position)-tagged
            # token: deterministic, so identical source texts stay
            # identical within the replica (dup clusters preserved),
            # but any 8-gram shingle crossing a rewritten position
            # differs from the source replica's shingle.
            def rewrite(text: str, i: int = i) -> str:
                toks = text.split(" ")
                for j in range(0, len(toks), 3):
                    toks[j] = f"w{i}p{j}"
                return " ".join(toks)

            rep["text"] = rep["text"].map(rewrite)
            rep["n_chars"] = rep["text"].str.len()
        out.append(rep)
    alldf = pd.concat(out, ignore_index=True)
    alldf.to_parquet(f"{dst}/documents.parquet", index=False)
    print(f"  documents: x{factor} (perturbed)")


def perturb_embeddings(src: str, dst: str, factor: int) -> None:
    df = pd.read_parquet(f"{src}/embeddings.parquet")
    base = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(base, axis=1, keepdims=True)
    unit = base / np.where(nrm == 0, 1.0, nrm)
    dim = base.shape[1]
    alpha = 0.35  # target cross-replica cosine to the source vector
    beta = float(np.sqrt(1.0 - alpha * alpha))
    frames = []
    for i in range(factor):
        if i == 0:
            vecs = base
        else:
            rng = np.random.RandomState(42_000 + i)
            g = rng.standard_normal(size=base.shape)
            # project out the component along the original so the mix
            # lands at exactly cos=alpha to it
            g -= (g * unit).sum(axis=1, keepdims=True) * unit
            g /= np.linalg.norm(g, axis=1, keepdims=True)
            vecs = (alpha * unit + beta * g) * nrm  # keep source norms
        frames.append(
            pd.DataFrame(
                {
                    "vec_id": df["vec_id"] + i * OFF,
                    "embedding": list(vecs.astype(np.float32)),
                    "label": df["label"],
                }
            )
        )
    alldf = pd.concat(frames, ignore_index=True)
    table = pa.Table.from_pandas(
        alldf,
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
        preserve_index=False,
    )
    pq.write_table(table, f"{dst}/embeddings.parquet")
    print(f"  embeddings: x{factor} (perturbed, cross-replica cos~{alpha})")


def gen_vectors(
    dst: str,
    n: int,
    dim: int = 256,
    seed: int = 7,
    dup_frac: float = 0.3,
    fam: int = 4,
    n_labels: int = 10,
) -> None:
    """A production-like-dimension embeddings table with PLANTED near-dup
    families, so the family's documented operating point DUP_COS=0.55
    works above the noise floor (VERDICT r9 next #6 / SCALE.md
    §vector-stream: at d=32 random cosines are ~N(0, 0.18) and the
    2e10-candidate noise floor itself crosses any usable threshold; at
    d=256 noise sigma is 1/16, so even the max over 2e10 pairs stays
    under ~0.4).

    ``dup_frac`` of the vectors belong to families of ``fam`` members,
    each member at cosine ~U(0.82, 0.97) to its family seed — pairwise
    member cosines land at ~a_i*a_j >= ~0.67, safely above 0.55; all
    other vectors are independent Gaussians (pairwise |cos| < ~0.4 at
    6 sigma). Norms vary U(0.5, 2) — cosine-invariant, so downstream
    normalization paths do real work. Labels uniform over
    ``n_labels`` (filtered-probe ready). Family members get RANDOM
    vec_ids, so an epoch split (vec_id % k) spreads a family across
    epochs — the streaming gate sees both cross-epoch corpus hits and
    same-epoch collapses."""
    rng = np.random.RandomState(seed)
    V = rng.standard_normal((n, dim))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    n_fam = max(1, int(n * dup_frac) // fam)
    member_idx = rng.permutation(n)[: n_fam * fam]
    seeds = rng.standard_normal((n_fam, dim))
    seeds /= np.linalg.norm(seeds, axis=1, keepdims=True)
    for f in range(n_fam):
        s = seeds[f]
        for j in range(fam):
            i = member_idx[f * fam + j]
            a = rng.uniform(0.82, 0.97)
            g = rng.standard_normal(dim)
            g -= g.dot(s) * s
            g /= np.linalg.norm(g)
            V[i] = a * s + np.sqrt(1.0 - a * a) * g
    norms = rng.uniform(0.5, 2.0, size=(n, 1))
    vecs = (V * norms).astype(np.float32)
    labels = rng.randint(0, n_labels, size=n).astype(np.int32)
    table = pa.Table.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs), "label": labels}
        ),
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
        preserve_index=False,
    )
    os.makedirs(dst, exist_ok=True)
    pq.write_table(table, f"{dst}/embeddings.parquet")
    with open(f"{dst}/MANIFEST.json", "w") as f:
        json.dump(
            {
                "model": "planted near-dup families",
                "n": n,
                "dim": dim,
                "dup_frac": dup_frac,
                "family_size": fam,
                "member_seed_cos": [0.82, 0.97],
                "seed": seed,
            },
            f,
        )
    print(f"  embeddings: n={n} d={dim} ({n_fam} families of {fam})")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaledata", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--vectors-only",
        action="store_true",
        help="write only a planted-family embeddings table (gen_vectors)",
    )
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--n", type=int, default=200_000)
    args = ap.parse_args()

    if args.vectors_only:
        gen_vectors(args.dst, args.n, args.dim)
        return

    os.makedirs(args.dst, exist_ok=True)
    for d in DIMS:
        shutil.copy(f"{args.src}/{d}.parquet", f"{args.dst}/{d}.parquet")
        print(f"  {d}: copied")
    scale_facts(args.src, args.dst, args.factor)
    perturb_documents(args.src, args.dst, args.factor)
    perturb_embeddings(args.src, args.dst, args.factor)
    manifest = {
        "src": args.src,
        "factor": args.factor,
        "model": "disjoint shards, shared dims, perturbed docs/embeddings",
    }
    with open(f"{args.dst}/MANIFEST.json", "w") as f:
        json.dump(manifest, f)
    print("done:", args.dst)


if __name__ == "__main__":
    main()
