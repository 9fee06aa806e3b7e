"""The sf-scale generator's non-degeneracy contract (BASELINE.md round
9): replicas must preserve within-replica shingle structure EXACTLY
(the blow-up measures the same workload at 10x, not a different one)
while sharing ZERO shingles across replicas (pair counts scale
linearly, as a real 10x corpus would — replicating ids alone would
make every doc 9 exact near-dups and square the pair work).

Pure DuckDB, no Spark session; runs on the tiny sf0.001 source.
"""

from __future__ import annotations

import pathlib

import duckdb
import pytest

import gen_sfscale

SRC = "/root/testdata/sf0.001"
K = 5  # shingle width used by the weak-five queries


@pytest.fixture(scope="module")
def blown(tmp_path_factory):
    out = tmp_path_factory.mktemp("sfscale") / "x2"
    n = gen_sfscale.generate(SRC, pathlib.Path(out), replicas=2)
    return out, n


def _shingle_rows(con, path: str, leg: str) -> str:
    """A (doc_id, shingle) relation of word K-grams, mirroring
    text.shingles' n>=k branch (short docs don't matter for the
    cross-replica disjointness claim)."""
    return f"""
    SELECT doc_id,
           unnest(list_transform(
             range(1, len(toks) - {K} + 2),
             i -> array_to_string(toks[i : i + {K - 1}], ' ')
           )) AS shingle
    FROM (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM '{path}' {leg}
    )
    WHERE len(toks) >= {K}
    """


def test_row_count_and_disjoint_ids(blown):
    out, n = blown
    con = duckdb.connect()
    base = con.execute(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    assert n == 2 * base
    dup_ids = con.execute(
        f"SELECT count(*) - count(DISTINCT doc_id) "
        f"FROM '{out}/documents.parquet'"
    ).fetchone()[0]
    assert dup_ids == 0


def test_replica_zero_is_verbatim(blown):
    out, _ = blown
    con = duckdb.connect()
    diff = con.execute(
        f"""
        SELECT count(*) FROM (
          (SELECT * FROM '{SRC}/documents.parquet'
           EXCEPT
           SELECT * FROM '{out}/documents.parquet'
           WHERE doc_id < {gen_sfscale.ID_STRIDE})
          UNION ALL
          (SELECT * FROM '{out}/documents.parquet'
           WHERE doc_id < {gen_sfscale.ID_STRIDE}
           EXCEPT
           SELECT * FROM '{SRC}/documents.parquet')
        )
        """
    ).fetchone()[0]
    assert diff == 0


def test_within_replica_structure_identical(blown):
    """The salted replica's shingle MULTISET per doc maps 1:1 onto the
    base corpus's: same per-doc shingle counts, same cross-doc equality
    structure (token suffixing is a vocabulary bijection)."""
    out, _ = blown
    con = duckdb.connect()
    # per-doc distinct/total shingle counts must match base exactly
    rows = con.execute(
        f"""
        WITH base AS (
          SELECT doc_id, count(*) AS n, count(DISTINCT shingle) AS d
          FROM ({_shingle_rows(con, f'{SRC}/documents.parquet', '')})
          GROUP BY doc_id
        ), rep AS (
          SELECT doc_id - {gen_sfscale.ID_STRIDE} AS doc_id,
                 count(*) AS n, count(DISTINCT shingle) AS d
          FROM ({_shingle_rows(con, f'{out}/documents.parquet',
                               f'WHERE doc_id >= {gen_sfscale.ID_STRIDE}')})
          GROUP BY doc_id
        )
        SELECT count(*) FROM base FULL JOIN rep USING (doc_id)
        WHERE base.n IS DISTINCT FROM rep.n
           OR base.d IS DISTINCT FROM rep.d
        """
    ).fetchone()[0]
    assert rows == 0


def test_embeddings_sign_flip_is_orthogonal(blown):
    """The replica transform must preserve norms and within-replica
    cosine structure exactly (diagonal ±1 is orthogonal): every
    replica-1 vector's |x_j| equals its base vector's, ids/labels are
    re-keyed disjointly, and at least one sign actually flips (the
    transform is not the identity, or cross-replica cosines would all
    be 1)."""
    out, _ = blown
    con = duckdb.connect()
    bad = con.execute(
        f"""
        WITH base AS (
          SELECT vec_id, embedding FROM '{SRC}/embeddings.parquet'
        ), rep AS (
          SELECT vec_id - {gen_sfscale.ID_STRIDE} AS vec_id, embedding
          FROM '{out}/embeddings.parquet'
          WHERE vec_id >= {gen_sfscale.ID_STRIDE}
        )
        SELECT count(*) FROM base JOIN rep USING (vec_id)
        WHERE len(base.embedding) != len(rep.embedding)
           OR list_contains(
                list_transform(range(1, len(base.embedding) + 1),
                  j -> abs(base.embedding[j]) != abs(rep.embedding[j])),
                true)
        """
    ).fetchone()[0]
    assert bad == 0
    stride = gen_sfscale.ID_STRIDE
    flipped = con.execute(
        f"""
        WITH base AS (
          SELECT vec_id, embedding FROM '{SRC}/embeddings.parquet'
        ), rep AS (
          SELECT vec_id - {stride} AS vec_id, embedding
          FROM '{out}/embeddings.parquet'
          WHERE vec_id >= {stride}
        )
        SELECT count(*) FROM base JOIN rep USING (vec_id)
        WHERE list_contains(
                list_transform(range(1, len(base.embedding) + 1),
                  j -> base.embedding[j] != rep.embedding[j]
                       AND base.embedding[j] != 0),
                true)
        """
    ).fetchone()[0]
    assert flipped > 0
    dup_labels = con.execute(
        f"""
        SELECT count(*) FROM (
          SELECT label FROM '{out}/embeddings.parquet'
          WHERE vec_id < {gen_sfscale.ID_STRIDE}
          INTERSECT
          SELECT label FROM '{out}/embeddings.parquet'
          WHERE vec_id >= {gen_sfscale.ID_STRIDE}
        )
        """
    ).fetchone()[0]
    assert dup_labels == 0


def test_zero_cross_replica_shingle_matches(blown):
    out, _ = blown
    con = duckdb.connect()
    shared = con.execute(
        f"""
        SELECT count(*) FROM (
          SELECT shingle
          FROM ({_shingle_rows(con, f'{out}/documents.parquet',
                               f'WHERE doc_id < {gen_sfscale.ID_STRIDE}')})
          INTERSECT
          SELECT shingle
          FROM ({_shingle_rows(con, f'{out}/documents.parquet',
                               f'WHERE doc_id >= {gen_sfscale.ID_STRIDE}')})
        )
        """
    ).fetchone()[0]
    assert shared == 0


def test_tainted_base_corpus_is_rejected(tmp_path):
    """A base token already carrying the replica suffix pattern would
    break cross-replica shingle disjointness (replica 1's rewrite of
    'foo' collides with a literal 'foo_s1') — generate() must refuse
    instead of silently producing super-linear pair scaling (round-9
    review finding)."""
    con = duckdb.connect()
    src = tmp_path / "tainted"
    src.mkdir()
    con.execute(
        f"""
        COPY (
          SELECT * FROM (VALUES
            (1, 'alpha beta gamma delta epsilon zeta', 'en', 'src0', 36),
            (2, 'alpha_s1 beta gamma delta epsilon zeta', 'en', 'src0', 39)
          ) AS t(doc_id, text, lang, source, n_chars)
        ) TO '{src / "documents.parquet"}' (FORMAT PARQUET)
        """
    )
    with pytest.raises(ValueError, match="replica suffix"):
        gen_sfscale.generate(str(src), tmp_path / "out", replicas=2)


def test_graph_grows_with_replicas(blown):
    """The pagerank domain fold (key % 997 + 997 * (key // ID_STRIDE))
    must see a graph that actually GROWS with replicas (round-10,
    VERDICT r9 #5): each replica's orders keys live in their own
    ID_STRIDE block, so the folded node/edge sets are disjoint copies —
    nodes and distinct edges scale exactly x replicas, with per-replica
    structure preserved (the former verbatim copy kept the graph at
    <=997 nodes at every scale)."""
    out, _ = blown
    con = duckdb.connect()
    fold_src = "o_custkey % 997 + 997 * (o_custkey // 1000000)"
    fold_dst = "o_orderkey % 997 + 997 * (o_orderkey // 1000000)"

    def graph_counts(path: str) -> tuple[int, int]:
        return con.execute(
            f"""
            WITH edges AS (
              SELECT DISTINCT {fold_src} AS src, {fold_dst} AS dst
              FROM '{path}' WHERE {fold_src} <> {fold_dst}
            )
            SELECT (SELECT count(*) FROM
                      (SELECT src FROM edges UNION SELECT dst FROM edges)),
                   (SELECT count(*) FROM edges)
            """
        ).fetchone()

    base_nodes, base_edges = graph_counts(f"{SRC}/orders.parquet")
    blown_nodes, blown_edges = graph_counts(f"{out}/orders.parquet")
    assert blown_nodes == 2 * base_nodes
    assert blown_edges == 2 * base_edges


def test_base_ids_must_fit_under_stride(tmp_path):
    """A base id at or above the stride would collide replica key
    spaces (round-10 review) — generate() must refuse."""
    con = duckdb.connect()
    src = tmp_path / "bigid"
    src.mkdir()
    con.execute(
        f"""
        COPY (
          SELECT * FROM (VALUES
            (1, 'alpha beta gamma delta epsilon', 'en', 'src0', 30),
            ({gen_sfscale.ID_STRIDE + 7},
             'zeta eta theta iota kappa', 'en', 'src0', 25)
          ) AS t(doc_id, text, lang, source, n_chars)
        ) TO '{src / "documents.parquet"}' (FORMAT PARQUET)
        """
    )
    with pytest.raises(ValueError, match="key spaces would collide"):
        gen_sfscale.generate(str(src), tmp_path / "out", replicas=2)
