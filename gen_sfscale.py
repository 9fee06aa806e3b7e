#!/usr/bin/env python
"""Synthesize an sf~1 testdata blow-up for the weak-set scaling proof
(VERDICT r8 "Next round" #2).

/root/testdata is read-only and tops out at sf0.1, but the weak five
(span_cut_text, prefix_filter_pairs, triangle_count_oriented,
dedup_clusters_star, minhash_lsh_pairs) all carry the claim that their
>2x ratio is a fixed job floor amortizing with data size — BASELINE.md's
round-8 table shows one decade (sf0.01 -> sf0.1); this generator builds
the NEXT decade so the claim is measured, not extrapolated.

Method: replicate sf0.1's documents table REPLICAS times. Replica 0 is
the original corpus verbatim; replica i>0 re-keys doc_id (+ i *
ID_STRIDE) and suffixes EVERY whitespace token with "_s{i}". Token
suffixing is a per-replica bijection of the vocabulary, so:

- WITHIN a replica, the shingle/minhash/simhash structure (and thus the
  near-dup pair graph, cluster sizes, span structure) is identical to
  the real corpus — not a degenerate all-unique or all-duplicate blob;
- ACROSS replicas, no 5-token shingle ever matches (every token differs
  in its suffix), so pair counts scale exactly linearly (pairs(sf1) =
  REPLICAS x pairs(sf0.1)) — the realistic shape for 10x more data,
  instead of the quadratic blow-up that replicating ids alone would
  produce (each doc would gain REPLICAS-1 exact near-dups and bucket
  pair work would scale x REPLICAS^2).

The embeddings table gets the same treatment with a different
bijection: replica i>0 re-keys vec_id (+ i*ID_STRIDE) and label
(+ i*LABEL_STRIDE) and applies a deterministic per-(replica, dim)
SIGN FLIP to each vector — a diagonal ±1 orthogonal transform, so
norms and all WITHIN-replica cosines are bit-preserved (the same
semantic-dup structure per replica) while cross-replica cosines
decorrelate (no spurious cross-replica near-dups; cluster count scales
x REPLICAS at constant cluster size — linear pair work, the realistic
10x-corpus shape for semdedup / cosine-LSH / ANN).

The remaining eight tables are copied verbatim (they keep the
directory a drop-in sf_dir for any query and for DuckDB view
registration).

Usage: python gen_sfscale.py [out_dir] [replicas]   (defaults:
<repo>/.scratch/sf1, 10)
"""

from __future__ import annotations

import pathlib
import shutil
import sys

SRC = "/root/testdata/sf0.1"
ID_STRIDE = 1_000_000  # max sf0.1 doc_id is ~5e3; stride keeps ids disjoint
LABEL_STRIDE = 100_000  # embeddings carry 10 labels; stride keeps them disjoint
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def generate(src: str, out: pathlib.Path, replicas: int) -> int:
    """Write the blown-up testdata dir; returns the documents row count."""
    import duckdb

    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    # The per-replica vocabulary bijection assumes NO base token already
    # carries a replica suffix: a literal 'foo_s1' in replica 0 would
    # collide with replica 1's rewrite of 'foo', replicas would share
    # shingles, and pair counts would scale super-linearly — silently
    # invalidating the linear-scaling contract the generator exists to
    # provide (round-9 review finding). Assert it on the actual corpus,
    # not just the toy test fixture.
    n_tainted = con.execute(
        f"SELECT count(*) FROM '{src}/documents.parquet' "
        f"WHERE regexp_matches(text, '\\S_s[0-9]+(\\s|$)')"
    ).fetchone()[0]
    if n_tainted:
        raise ValueError(
            f"{n_tainted} base documents contain a token ending in the "
            f"replica suffix pattern '_s<i>'; the cross-replica shingle "
            f"disjointness contract would not hold — pick a different "
            f"suffix scheme for this corpus"
        )
    # The other disjointness contracts get the same arbitrary-corpus
    # check (round-10 review): a base id >= the stride would silently
    # collide replica key spaces and produce exactly the super-linear
    # pair scaling the taint assert above exists to prevent.
    for table, col, stride in (
        ("documents", "doc_id", ID_STRIDE),
        ("embeddings", "vec_id", ID_STRIDE),
        ("embeddings", "label", LABEL_STRIDE),
        ("orders", "o_custkey", ID_STRIDE),
        ("orders", "o_orderkey", ID_STRIDE),
    ):
        mx = con.execute(
            f"SELECT max({col}) FROM '{src}/{table}.parquet'"
        ).fetchone()[0]
        if mx is not None and mx >= stride:
            raise ValueError(
                f"max({table}.{col}) = {mx} >= stride {stride}; replica "
                f"key spaces would collide — raise the stride for this "
                f"corpus"
            )
    legs = []
    for i in range(replicas):
        if i == 0:
            legs.append(
                f"SELECT doc_id, text, lang, source, n_chars "
                f"FROM '{src}/documents.parquet'"
            )
        else:
            legs.append(
                f"SELECT doc_id + {i * ID_STRIDE} AS doc_id, "
                # suffix every token: per-replica vocabulary bijection
                f"regexp_replace(text, '(\\S+)', '\\1_s{i}', 'g') AS text, "
                f"lang, source, "
                f"length(regexp_replace(text, '(\\S+)', '\\1_s{i}', 'g')) AS n_chars "
                f"FROM '{src}/documents.parquet'"
            )
    sql = " UNION ALL ".join(legs)
    con.execute(
        f"COPY ({sql}) TO '{out / 'documents.parquet'}' (FORMAT PARQUET)"
    )
    emb_legs = []
    for i in range(replicas):
        if i == 0:
            emb_legs.append(
                f"SELECT vec_id, embedding, label "
                f"FROM '{src}/embeddings.parquet'"
            )
        else:
            # diagonal ±1 orthogonal transform: deterministic
            # per-(replica, dim) sign flip — norms and within-replica
            # cosines bit-preserved, cross-replica cosines decorrelated
            emb_legs.append(
                f"SELECT vec_id + {i * ID_STRIDE} AS vec_id, "
                f"list_transform(range(1, len(embedding) + 1), "
                f"j -> (embedding[j] * (CASE WHEN hash({i} * 131 + j) % 2 = 0 "
                f"THEN 1 ELSE -1 END))::FLOAT) AS embedding, "
                f"label + {i * LABEL_STRIDE} AS label "
                f"FROM '{src}/embeddings.parquet'"
            )
    emb_sql = " UNION ALL ".join(emb_legs)
    con.execute(
        f"COPY ({emb_sql}) TO '{out / 'embeddings.parquet'}' (FORMAT PARQUET)"
    )
    # orders grows too (round-10, VERDICT r9 #5): both graph keys shift
    # by i*ID_STRIDE per replica, so the block-aware domain fold in
    # q_pagerank_domains (key % 997 + 997 * (key // ID_STRIDE)) yields
    # REPLICAS disjoint copies of the base's folded graph — nodes and
    # edges scale x REPLICAS with per-replica structure preserved,
    # instead of the former verbatim copy whose mod-997 graph stayed
    # 997 nodes at every scale (a 22x "ratio" that measured DuckDB on a
    # constant-size graph vs Spark's flat per-iteration floor, not
    # scaling). Non-key columns are verbatim; replica orders reference
    # no replica customer rows, so order-side joins at sf~1 measure the
    # realistic miss path (inner joins keep only replica-0 matches).
    ord_legs = []
    for i in range(replicas):
        if i == 0:
            ord_legs.append(f"SELECT * FROM '{src}/orders.parquet'")
        else:
            ord_legs.append(
                f"SELECT o_orderkey + {i * ID_STRIDE} AS o_orderkey, "
                f"o_custkey + {i * ID_STRIDE} AS o_custkey, "
                f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
                f"FROM '{src}/orders.parquet'"
            )
    ord_sql = " UNION ALL ".join(ord_legs)
    con.execute(
        f"COPY ({ord_sql}) TO '{out / 'orders.parquet'}' (FORMAT PARQUET)"
    )
    for t in TABLES:
        if t in ("documents", "embeddings", "orders"):
            continue
        shutil.copyfile(f"{src}/{t}.parquet", out / f"{t}.parquet")
    return con.execute(
        f"SELECT count(*) FROM '{out / 'documents.parquet'}'"
    ).fetchone()[0]


def main() -> int:
    repo = pathlib.Path(__file__).resolve().parent
    out = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else repo / ".scratch" / "sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n = generate(SRC, out, replicas)
    print(f"wrote {out}: documents={n} rows ({replicas} replicas)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
