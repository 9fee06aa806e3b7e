"""DuckDB oracle-SQL generators for the training-data operators.

Each generator reproduces EXACTLY the math of the corresponding Spark
operator (same md5-based hashing, same permutation/hyperplane constants,
same fold order — verified bit-identical), so the driver's value-hash
comparison is meaningful for non-trivial pipelines like MinHash LSH.
"""

from __future__ import annotations

from ..operators.dedup import BANDS, NUM_HASHES, PERMS, ROWS_PER_BAND
from ..operators.similarity import HYPERPLANES
from ..operators.text import (
    BPE_TOKEN_RE,
    HASH_P,
    STOPWORDS,
    TOKEN_SPLIT_RE,
    _LANG_MARKERS,
    _LANG_ORDER,
)


def hexfold(expr: str, nchars: int) -> str:
    """md5-prefix -> BIGINT, identical to Spark's conv(substr(md5,..),16,10)."""
    return (
        "list_reduce(list_transform(string_split(substr(md5("
        + expr
        + f"),1,{nchars}),''),"
        " c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a,b) -> a*16+b)"
    )


def hexfold_slice(hex_expr: str, start: int, nchars: int) -> str:
    """Fold an ALREADY-COMPUTED hex string's substring to BIGINT —
    identical to Spark's conv(substring(hx, start, nchars), 16, 10).
    Lets one md5 feed several independent hash slices (the
    Kirsch–Mitzenmeier double-hashing scheme in bloom_prune computes
    h1/h2 from one digest instead of k digests)."""
    return (
        f"list_reduce(list_transform(string_split(substr({hex_expr},"
        f"{start},{nchars}),''),"
        " c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a,b) -> a*16+b)"
    )


def hash32(expr: str) -> str:
    return hexfold(expr, 8)


def hash60(expr: str) -> str:
    return hexfold(expr, 15)


def tokens(expr: str) -> str:
    return f"list_filter(regexp_split_to_array({expr}, '{TOKEN_SPLIT_RE}'), t -> t <> '')"


def shingles(toks: str, k: int = 5) -> str:
    """Word k-grams from a token list (1-based list indexing in DuckDB)."""
    parts = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(1, k + 1))
    return f"""CASE
      WHEN len({toks}) >= {k} THEN
        list_transform(range(0, len({toks}) - {k} + 1), i -> {parts})
      WHEN len({toks}) > 0 THEN [array_to_string({toks}, ' ')]
      ELSE []::VARCHAR[] END"""


def minhash_sig(hashes: str) -> str:
    """array of NUM_HASHES minima over the (a*h+b) % P permutations."""
    mins = ",\n      ".join(
        f"list_min(list_transform({hashes}, h -> ({a}::BIGINT * h + {b}::BIGINT) % {HASH_P}))"
        for (a, b) in PERMS
    )
    return f"[{mins}]"


def band_bucket(sig: str, band: int) -> str:
    cols = " || ',' || ".join(
        f"CAST({sig}[{band * ROWS_PER_BAND + r + 1}] AS VARCHAR)"
        for r in range(ROWS_PER_BAND)
    )
    return f"md5({cols})"


def lsh_banded_cte(max_bucket: int = 64, suffix: str = "", where: str = "") -> str:
    """CTEs: documents -> per-doc signature -> (doc_id, band, bucket),
    degenerate buckets dropped (same cap as the Spark operator).
    ``suffix`` renames every CTE (for two independent side chains);
    ``where`` restricts the source rows (cross-corpus oracles)."""
    s = suffix
    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS band, {band_bucket('sig', b)} AS bucket FROM sigs{s}"
        for b in range(BANDS)
    )
    wh = f" WHERE {where}" if where else ""
    return f"""
    toks{s} AS (SELECT doc_id, {tokens('text')} AS t FROM documents{wh}),
    sh{s} AS (SELECT doc_id, {shingles('t')} AS s FROM toks{s}),
    hs{s} AS (SELECT doc_id, list_transform(s, x -> {hash32('x')}) AS hh FROM sh{s}),
    sigs{s} AS (SELECT doc_id, {minhash_sig('hh')} AS sig FROM hs{s}),
    banded{s} AS (
      {band_selects}
    ),
    capped{s} AS (
      SELECT * FROM banded{s}
      QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= {max_bucket}
    )"""


def minhash_lsh_pairs_sql(max_bucket: int = 64) -> str:
    return f"""
    WITH {lsh_banded_cte(max_bucket)}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM capped a JOIN capped b USING (band, bucket)
    WHERE a.doc_id < b.doc_id
    """


def ngram_jaccard_pairs_sql(threshold: float = 0.5, max_bucket: int = 64) -> str:
    return f"""
    WITH {lsh_banded_cte(max_bucket)},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b USING (band, bucket)
      WHERE a.doc_id < b.doc_id
    ),
    sets AS (SELECT doc_id, list_distinct(s) AS ds FROM sh)
    SELECT doc_a, doc_b,
           len(list_intersect(x.ds, y.ds))
             / greatest(len(list_distinct(list_concat(x.ds, y.ds))), 1) AS jaccard
    FROM cand JOIN sets x ON cand.doc_a = x.doc_id
              JOIN sets y ON cand.doc_b = y.doc_id
    WHERE len(list_intersect(x.ds, y.ds))
            / greatest(len(list_distinct(list_concat(x.ds, y.ds))), 1) >= {threshold}
    """


def simhash_sql_expr(hashes: str, bits: int = 60) -> str:
    terms = []
    for i in range(bits):
        vote = (
            f"list_sum(list_transform({hashes}, h -> "
            f"CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"CASE WHEN {vote} > 0 THEN {2**i}::BIGINT ELSE 0::BIGINT END")
    return "(" + "\n      + ".join(terms) + ")"


def simhash_pairs_sql(max_hamming: int = 3, n_chunks: int = 4, chunk_bits: int = 15) -> str:
    mask = (1 << chunk_bits) - 1
    chunk_selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, sh, {i} AS chunk_idx, (sh >> {i * chunk_bits}) & {mask} AS chunk FROM sims"
        for i in range(n_chunks)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(list_distinct({tokens('text')}), t -> {hash60('t')}) AS hh
      FROM documents
    ),
    sims AS (SELECT doc_id, {simhash_sql_expr('hh')} AS sh FROM toks),
    chunks AS (
      {chunk_selects}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.sh, b.sh)) AS hamming
    FROM chunks a JOIN chunks b USING (chunk_idx, chunk)
    WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= {max_hamming}
    """


# --- embeddings --------------------------------------------------------------

_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x,y) -> x+y)"
)
_NORM = (
    "sqrt(list_reduce(list_transform({a}, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE)),"
    " (x,y) -> x+y))"
)


def dot_sql(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


def norm_sql(a: str) -> str:
    return _NORM.format(a=a)


def ann_topk_sql(k: int = 5, n_queries: int = 20) -> str:
    return f"""
    WITH normed AS (
      SELECT vec_id, embedding, {norm_sql('embedding')} AS nrm FROM embeddings
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {dot_sql('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine
      FROM normed q, normed c
      WHERE q.vec_id < {n_queries} AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine
    FROM (SELECT *, ROW_NUMBER() OVER
            (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id DESC) AS rn
          FROM pairs)
    WHERE rn <= {k}
    """


def cosine_neardup_sql(threshold: float) -> str:
    return f"""
    WITH normed AS (
      SELECT vec_id, embedding, {norm_sql('embedding')} AS nrm FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cosine
    FROM normed a, normed b
    WHERE a.vec_id < b.vec_id
      AND {dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= {threshold}
    """


def hyperplane_sig_sql(vec: str) -> str:
    """Mirror of similarity.hyperplane_bucket_sql's NULL semantics
    (round-10 review): each multiply-add term is COALESCE'd to 0 so a
    short vector (or one with a NULL element) contributes its PRESENT
    terms to the plane dot — the former bare list_reduce fold
    NULL-poisoned the whole sum and routed such rows to bucket 0,
    diverging from Spark exactly on the degenerate inputs the Spark
    fix targets. DuckDB lists are 1-indexed and out-of-range access
    returns NULL, same as Spark's get(); left-chained ``+`` keeps the
    fold order bit-identical."""
    parts = []
    for j, plane in enumerate(HYPERPLANES):
        terms = " + ".join(
            f"COALESCE(CAST({vec}[{i + 1}] AS DOUBLE) * {w:.1f}, 0.0)"
            for i, w in enumerate(plane)
        )
        parts.append(
            f"CASE WHEN ({terms}) > 0 THEN {2**j}::BIGINT ELSE 0::BIGINT END"
        )
    return "(" + " + ".join(parts) + ")"


def nonempty_vec_pred(vec: str) -> str:
    """Mirror of similarity.nonempty_vec_sql: the Spark side drops
    NULL/empty-vector rows before bucket assignment (the old signature
    join dropped them implicitly); the oracle must too."""
    return f"{vec} IS NOT NULL AND len({vec}) > 0"


def lsh_bucket_counts_sql() -> str:
    return f"""
    SELECT {hyperplane_sig_sql('embedding')} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM embeddings WHERE {nonempty_vec_pred('embedding')} GROUP BY 1
    """


def cosine_neardup_lsh_sql(threshold: float) -> str:
    """LSH-blocked near-dup: pairs only within the same hyperplane
    bucket (the scale path — identical blocking on both engines)."""
    return f"""
    WITH sig AS (
      SELECT vec_id, embedding, {norm_sql('embedding')} AS nrm,
             {hyperplane_sig_sql('embedding')} AS bucket
      FROM embeddings WHERE {nonempty_vec_pred('embedding')}
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cosine
    FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= {threshold}
    """


def ivf_centroids_sql() -> str:
    return """
    SELECT label, i - 1 AS dim_idx,
           CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e10 + 0.5) AS BIGINT))
                AS DOUBLE) / 1e10 / COUNT(*) AS mean_val
    FROM embeddings CROSS JOIN UNNEST(range(1, 65)) AS t(i)
    GROUP BY label, i
    """



def ann_ivf_probe_sql(k: int = 5, n_queries: int = 20, nprobe: int = 1) -> str:
    """IVF probe: quantized-mean centroids (identical doubles on both
    engines), nprobe-nearest-centroid assignment (ties -> smallest
    label), exact search within the probed clusters only."""
    return f"""
    WITH means AS ({ivf_centroids_sql()}),
    cent AS (
      SELECT label, list(mean_val ORDER BY dim_idx) AS centroid
      FROM means GROUP BY label
    ),
    centn AS (SELECT label, centroid, {norm_sql('centroid')} AS c_nrm FROM cent),
    q AS (
      SELECT vec_id, embedding, {norm_sql('embedding')} AS q_nrm
      FROM embeddings WHERE vec_id < {n_queries}
    ),
    assigned AS (
      SELECT vec_id AS query_id, embedding, q_nrm, label AS probe_label
      FROM (
        SELECT q.*, c.label,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {dot_sql('q.embedding', 'c.centroid')} / (q.q_nrm * c.c_nrm) DESC,
                          c.label ASC
               ) AS rn
        FROM q, centn c
      ) WHERE rn <= {nprobe}
    ),
    corpus AS (
      SELECT vec_id, label, embedding, {norm_sql('embedding')} AS c_nrm
      FROM embeddings
    ),
    probed AS (
      SELECT a.query_id, c.vec_id AS neighbor_id,
             {dot_sql('a.embedding', 'c.embedding')} / (a.q_nrm * c.c_nrm) AS cosine
      FROM assigned a JOIN corpus c
        ON c.label = a.probe_label AND c.vec_id <> a.query_id
    )
    SELECT query_id, neighbor_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id DESC) AS rn
      FROM probed
    ) WHERE rn <= {k}
    """


# --- text analysis -----------------------------------------------------------

def quality_expr_sql(toks: str = "toks", nch: str = "nch", npunct: str = "npunct") -> str:
    """The composite quality heuristic as a SQL expression over
    pre-computed token-list / char-count / punct-count columns —
    identical to operators.text.quality_score."""
    stop_list = "[" + ",".join(f"'{w}'" for w in STOPWORDS) + "]"
    return f"""CAST(CASE WHEN {nch} >= 100 AND {nch} <= 20000 THEN 0.25 ELSE 0.0 END
            + CASE WHEN {npunct} / greatest({nch}, 1) <= 0.2 THEN 0.25 ELSE 0.0 END
            + CASE WHEN len(list_filter({toks}, x -> list_contains({stop_list}, lower(x))))
                     / greatest(len({toks}), 1) >= 0.05 THEN 0.25 ELSE 0.0 END
            + CASE WHEN {nch} / greatest(len({toks}), 1) >= 3
                    AND {nch} / greatest(len({toks}), 1) <= 12 THEN 0.25 ELSE 0.0 END
             AS DOUBLE)"""


def dedup_keep_best_sql(iterations: int = 3, max_bucket: int = 64) -> str:
    """Canonical selection: per duplicate cluster keep the member with
    the highest quality score (ties -> min doc_id). Clusters are the
    dedup_clusters CTE chain verbatim; quality is quality_expr_sql."""
    npunct = "len(regexp_extract_all(text, '[^\\w\\s]'))"
    qexpr = quality_expr_sql(tokens("text"), "length(text)", npunct)
    return f"""
    WITH clusters AS ({dedup_clusters_sql(iterations, max_bucket)}),
    q AS (
      SELECT doc_id, {qexpr} AS quality
      FROM documents
    ),
    j AS (
      SELECT c.cluster_id, c.doc_id, q.quality
      FROM clusters c JOIN q USING (doc_id)
    )
    SELECT cluster_id,
           doc_id AS kept_doc_id,
           quality AS kept_quality,
           n_members
    FROM (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY quality DESC, doc_id ASC) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
      FROM j
    ) WHERE rn = 1
    """


def shard_assignment_sql(n_shards: int = 16) -> str:
    """Deterministic content-keyed output sharding: shard =
    hash32(normalized content md5) mod n_shards; per-shard volume stats."""
    ck = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
    return f"""
    WITH k AS (
      SELECT doc_id, n_chars, {hash32(ck)} % {n_shards} AS shard
      FROM documents
    )
    SELECT CAST(shard AS INTEGER) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM k GROUP BY shard
    """


def text_stats_sql() -> str:
    toks = tokens("text")
    return f"""
    WITH t AS (
      SELECT doc_id, text, {toks} AS toks,
             length(text) AS nch,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS npunct
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS INTEGER)
             AS n_tokens_bpe,
           {quality_expr_sql()} AS quality
    FROM t
    """


def fingerprint_sql() -> str:
    toks = tokens("text")
    return f"""
    WITH t AS (SELECT doc_id, text, {toks} AS tk FROM documents),
    s AS (SELECT doc_id, text, {shingles('tk')} AS sh FROM t)
    SELECT doc_id,
           list_min(list_transform(sh, x -> {hash32('x')})) AS fingerprint,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_key
    FROM s
    """


def lang_id_sql() -> str:
    toks = tokens("text")
    score = {
        lang: (
            "len(list_filter(toks, t -> list_contains(["
            + ",".join(f"'{w}'" for w in markers)
            + "], lower(t))))"
        )
        for lang, markers in _LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(score[lang] for lang in _LANG_ORDER) + ")"
    cases = "\n        ".join(
        f"WHEN {score[lang]} = {best} THEN '{lang}'" for lang in _LANG_ORDER
    )
    return f"""
    WITH t AS (SELECT doc_id, text, {toks} AS toks FROM documents)
    SELECT doc_id,
      CASE
        WHEN len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) * 10
             > length(text) THEN 'zh'
        WHEN {best} = 0 THEN 'und'
        {cases}
        ELSE 'und'
      END AS lang_detected
    FROM t
    """


def dedup_exact_sql() -> str:
    return """
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_key,
           MIN(doc_id) AS canonical_id,
           CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM documents GROUP BY 1
    """


def kmeans_refine_sql(iters: int = 2, dim: int = 64) -> str:
    """Lloyd k-means refinement, CTE chain mirroring kmeans_lloyd:
    init = the quantized label means (ivf_centroids_sql), then per round
    assign (cosine, ties -> smallest label) + quantized-mean update;
    output = member count and vec_id checksum per final cluster."""
    def assign_cte(i: int, cent: str) -> str:
        return f"""
    centn{i} AS (SELECT label, centroid, {norm_sql('centroid')} AS c_nrm FROM {cent}),
    assign{i} AS (
      SELECT vec_id, embedding, label AS cluster FROM (
        SELECT e.vec_id, e.embedding, c.label,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {dot_sql('e.embedding', 'c.centroid')}
                          / ({norm_sql('e.embedding')} * c.c_nrm) DESC,
                          c.label ASC) AS rn
        FROM embeddings e, centn{i} c
      ) WHERE rn = 1
    )"""

    def update_cte(i: int) -> str:
        return f"""
    means{i} AS (
      SELECT cluster AS label, i - 1 AS dim_idx,
             CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e10 + 0.5)
                           AS BIGINT)) AS DOUBLE) / 1e10 / COUNT(*) AS mean_val
      FROM assign{i} CROSS JOIN UNNEST(range(1, {dim + 1})) AS t(i)
      GROUP BY cluster, i
    ),
    cent{i} AS (
      SELECT label, list(mean_val ORDER BY dim_idx) AS centroid
      FROM means{i} GROUP BY label
    )"""

    parts = [
        f"""
    means0 AS ({ivf_centroids_sql()}),
    cent0 AS (
      SELECT label, list(mean_val ORDER BY dim_idx) AS centroid
      FROM means0 GROUP BY label
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(assign_cte(i, f"cent{i-1}"))
        parts.append(update_cte(i))
    final = iters + 1
    parts.append(assign_cte(final, f"cent{iters}"))
    ctes = ",".join(parts)
    return f"""
    WITH {ctes}
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(vec_id) AS BIGINT) AS sum_vec_ids
    FROM assign{final} GROUP BY cluster
    """


def dedup_clusters_sql(
    iterations: int = 3, max_bucket: int = 64, materialized: bool = False
) -> str:
    """LSH candidate pairs -> fixed-iteration min-label propagation,
    matching operators.dedup.connected_components exactly.

    ``materialized`` forces AS MATERIALIZED on the edge/label CTEs:
    each iteration references l{i} twice, so DuckDB's inlining expands
    the chain 2^iterations-fold — fine at 3 iterations, fatal (fd
    exhaustion from thousands of parquet scan instances) at the 16
    iterations the converged dedup_clusters_star oracle uses."""
    mat = " MATERIALIZED" if materialized else ""
    ctes = [
        lsh_banded_cte(max_bucket),
        """cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b USING (band, bucket)
      WHERE a.doc_id < b.doc_id
    )""",
        f"""edges AS{mat} (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM cand
    )""",
        f"l0 AS{mat} (SELECT DISTINCT src AS doc_id, src AS cluster_id FROM edges)",
    ]
    for i in range(iterations):
        ctes.append(f"""l{i + 1} AS{mat} (
      SELECT l.doc_id,
             least(l.cluster_id,
                   coalesce(min(r.cluster_id), l.cluster_id)) AS cluster_id
      FROM l{i} l
      LEFT JOIN edges e ON e.src = l.doc_id
      LEFT JOIN l{i} r ON e.dst = r.doc_id
      GROUP BY l.doc_id, l.cluster_id
    )""")
    body = ",\n    ".join(ctes)
    return f"WITH {body}\n    SELECT doc_id, cluster_id FROM l{iterations}"


def incremental_neardup_sql(
    new_where: str,
    threshold: float = 0.5,
    max_bucket: int = 64,
) -> str:
    """Cross-corpus incremental dedup: LSH candidates between the NEW
    side (``new_where``) and the reference side (its complement), each
    side banded+capped independently (mirroring crosscorpus_candidates),
    exact-Jaccard verified, aggregated per new doc."""
    return f"""
    WITH {lsh_banded_cte(max_bucket, suffix='_n', where=new_where)},
    {lsh_banded_cte(max_bucket, suffix='_r', where=f'NOT ({new_where})')},
    cand AS (
      SELECT DISTINCT n.doc_id AS doc_a, r.doc_id AS doc_b
      FROM capped_n n JOIN capped_r r USING (band, bucket)
    ),
    sets AS (SELECT doc_id, list_distinct({shingles(tokens('text'))}) AS ds
             FROM documents),
    ver AS (
      SELECT doc_a,
             len(list_intersect(x.ds, y.ds))
               / greatest(len(list_distinct(list_concat(x.ds, y.ds))), 1) AS jaccard
      FROM cand JOIN sets x ON cand.doc_a = x.doc_id
                JOIN sets y ON cand.doc_b = y.doc_id
      WHERE len(list_intersect(x.ds, y.ds))
              / greatest(len(list_distinct(list_concat(x.ds, y.ds))), 1)
            >= {threshold}
    ),
    agg AS (
      SELECT doc_a AS doc_id, COUNT(*) AS n_ref_dups, MAX(jaccard) AS best_jaccard
      FROM ver GROUP BY doc_a
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.n_ref_dups, 0) AS BIGINT) AS n_ref_dups,
           COALESCE(a.best_jaccard, 0.0) AS best_jaccard,
           COALESCE(a.n_ref_dups, 0) > 0 AS is_dup
    FROM (SELECT doc_id FROM documents WHERE {new_where}) d
    LEFT JOIN agg a USING (doc_id)
    """


def semdedup_assigned_cte() -> str:
    """CTEs assigning every embedding to its nearest quantized-label-mean
    centroid by cosine (ties -> smallest label) — kmeans_assign over
    ivf_centroids, verbatim."""
    return f"""
    means AS ({ivf_centroids_sql()}),
    cent AS (
      SELECT label, list(mean_val ORDER BY dim_idx) AS centroid
      FROM means GROUP BY label
    ),
    centn AS (SELECT label, centroid, {norm_sql('centroid')} AS c_nrm FROM cent),
    assigned AS (
      SELECT vec_id, embedding, cluster FROM (
        SELECT e.vec_id, e.embedding, c.label AS cluster,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {dot_sql('e.embedding', 'c.centroid')}
                          / ({norm_sql('e.embedding')} * c.c_nrm) DESC,
                          c.label ASC) AS rn
        FROM embeddings e, centn c
      ) WHERE rn = 1
    )"""


def semdedup_prune_sql(threshold: float = 0.9) -> str:
    """SemDeDup: within-cluster cosine near-dup prune (keep the smallest
    id of each near-dup pair), per-cluster survivor stats."""
    return f"""
    WITH {semdedup_assigned_cte()},
    normed AS (
      SELECT vec_id, cluster, embedding, {norm_sql('embedding')} AS nrm
      FROM assigned
    ),
    pairs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM normed a JOIN normed b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE {dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= {threshold}
    ),
    pruned AS (SELECT DISTINCT ib AS vec_id FROM pairs)
    SELECT n.cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pruned,
           CAST(SUM(CASE WHEN p.vec_id IS NULL THEN n.vec_id END) AS BIGINT)
             AS kept_id_checksum
    FROM normed n LEFT JOIN pruned p USING (vec_id)
    GROUP BY n.cluster
    """


def pq_cte(dim: int = 64, subspaces: int = 4) -> str:
    """CTEs for the PQ pipeline: per-(sub, code) quantized-mean codebooks
    (codes = labels), corpus subvectors, encoded codes (argmax quantized
    inner product, ties -> smallest code) — mirroring pq_codebooks /
    pq_encode exactly."""
    subdim = dim // subspaces
    subs = ",".join(str(m) for m in range(subspaces))
    return f"""
    pqmeans AS (
      SELECT CAST(floor((i - 1) / {subdim}) AS INTEGER) AS sub,
             label AS code, i - 1 AS dim_idx,
             CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e10 + 0.5)
                           AS BIGINT)) AS DOUBLE) / 1e10 / COUNT(*) AS mean_val
      FROM embeddings CROSS JOIN UNNEST(range(1, {dim + 1})) AS t(i)
      GROUP BY sub, label, i
    ),
    books AS (
      SELECT sub, code, list(mean_val ORDER BY dim_idx) AS subcentroid
      FROM pqmeans GROUP BY sub, code
    ),
    sv AS (
      SELECT vec_id, m AS sub,
             embedding[m * {subdim} + 1 : (m + 1) * {subdim}] AS subvec
      FROM embeddings CROSS JOIN UNNEST([{subs}]) AS t(m)
    ),
    enc_scored AS (
      SELECT vec_id, sub, code,
             CAST(floor({dot_sql('subvec', 'subcentroid')} * 1e10 + 0.5) AS BIGINT)
               AS qd
      FROM sv JOIN books USING (sub)
    ),
    codes AS (
      SELECT vec_id, sub, code FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id, sub ORDER BY qd DESC, code ASC) AS rn
        FROM enc_scored
      ) WHERE rn = 1
    )"""


def pq_code_histogram_sql() -> str:
    return f"""
    WITH {pq_cte()}
    SELECT sub, code, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(vec_id) AS BIGINT) AS id_checksum
    FROM codes GROUP BY sub, code
    """


def pq_adc_cte(n_queries: int = 20) -> str:
    """CTEs lut/contrib/adc — the asymmetric-distance scoring block
    shared VERBATIM by ann_pq_adc_sql and ann_pq_rerank_sql (one place
    to fix the quantization constant or the self-match filter)."""
    return f"""
    lut AS (
      SELECT vec_id AS query_id, s.sub, b.code,
             CAST(floor({dot_sql('s.subvec', 'b.subcentroid')} * 1e10 + 0.5)
                  AS BIGINT) AS part
      FROM sv s JOIN books b USING (sub)
      WHERE s.vec_id < {n_queries}
    ),
    contrib AS (
      SELECT l.query_id, c.vec_id AS neighbor_id, l.part
      FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
      WHERE l.query_id <> c.vec_id
    ),
    adc AS (
      SELECT query_id, neighbor_id,
             CAST(SUM(part) AS DOUBLE) / 1e10 AS approx_dot
      FROM contrib GROUP BY query_id, neighbor_id
    )"""


def ann_pq_adc_sql(k: int = 5, n_queries: int = 20) -> str:
    return f"""
    WITH {pq_cte()},
    {pq_adc_cte(n_queries)}
    SELECT query_id, neighbor_id, approx_dot FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY approx_dot DESC, neighbor_id DESC) AS rn
      FROM adc
    ) WHERE rn <= {k}
    """


def ann_pq_rerank_sql(k: int = 5, shortlist: int = 20, n_queries: int = 20) -> str:
    """Two-stage retrieval: PQ ADC shortlist (ties -> neighbor_id desc,
    mirroring ann_pq_adc), exact-cosine rerank of only those pairs."""
    return f"""
    WITH {pq_cte()},
    {pq_adc_cte(n_queries)},
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY approx_dot DESC, neighbor_id DESC) AS rn
        FROM adc
      ) WHERE rn <= {shortlist}
    ),
    normed AS (
      SELECT vec_id, embedding, {norm_sql('embedding')} AS nrm FROM embeddings
    ),
    exact AS (
      SELECT s.query_id, s.neighbor_id,
             {dot_sql('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine
      FROM short s
      JOIN normed q ON q.vec_id = s.query_id
      JOIN normed c ON c.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id DESC) AS rn
      FROM exact
    ) WHERE rn <= {k}
    """


def skew_profile_sql(target: int = 1000) -> str:
    """Join-key skew diagnostic over lineitem.l_partkey — exact
    rank-based percentiles, integer-exact hot-key census, derived salt
    factor; mirrors q_skew_profile."""
    return f"""
    WITH counts AS (
      SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS total_rows,
             CAST(MAX(cnt) AS BIGINT) AS max_per_key
      FROM counts
    ),
    ranked AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt ASC, l_partkey ASC) AS rn
      FROM counts
    )
    SELECT s.n_keys, s.total_rows, s.max_per_key,
           CAST(MAX(CASE WHEN r.rn = floor((s.n_keys - 1) * 0.5) + 1
                         THEN r.cnt END) AS BIGINT) AS p50_per_key,
           CAST(MAX(CASE WHEN r.rn = floor((s.n_keys - 1) * 0.99) + 1
                         THEN r.cnt END) AS BIGINT) AS p99_per_key,
           CAST(SUM(CASE WHEN r.cnt * s.n_keys > 2 * s.total_rows
                         THEN 1 ELSE 0 END) AS BIGINT) AS hot_keys,
           CAST(floor((s.max_per_key + {target} - 1) / {target}) AS BIGINT)
             AS recommended_salt
    FROM ranked r CROSS JOIN stats s
    GROUP BY s.n_keys, s.total_rows, s.max_per_key
    """


def kmv_set_ops_sql(pairs, k: int = 64, n: int = 3) -> str:
    """KMV sketch algebra over per-language n-gram vocabularies:
    union estimate from the merged k-minimum sketch, intersection from
    the inclusion ratio — identical math to q_kmv_set_ops."""
    vals = ",".join(f"('{a}','{b}')" for a, b in pairs)
    toks = tokens("text")
    return f"""
    WITH t AS (SELECT lang, {toks} AS t FROM documents),
    g AS (SELECT DISTINCT lang, unnest({shingles('t', n)}) AS g FROM t),
    gh AS (SELECT DISTINCT lang, {hash60('g')} AS h FROM g),
    sk AS (
      SELECT lang, h FROM (
        SELECT lang, h, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rn
        FROM gh
      ) WHERE rn <= {k}
    ),
    pairs(lang_a, lang_b) AS (VALUES {vals}),
    merged AS (
      SELECT lang_a, lang_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
        SELECT p.lang_a, p.lang_b, s.h, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN sk s ON s.lang = p.lang_a
        UNION ALL
        SELECT p.lang_a, p.lang_b, s.h, 0 AS in_a, 1 AS in_b
        FROM pairs p JOIN sk s ON s.lang = p.lang_b
      ) GROUP BY lang_a, lang_b, h
    ),
    u AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY lang_a, lang_b ORDER BY h) AS rn
        FROM merged
      ) WHERE rn <= {k}
    ),
    est AS (
      SELECT lang_a, lang_b, MAX(h) AS kth, COUNT(*) AS m,
             SUM(in_a * in_b) AS n_common
      FROM u GROUP BY lang_a, lang_b
    ),
    eg AS (
      SELECT lang_a, lang_b, gg, MAX(a) AS a, MAX(b) AS b FROM (
        SELECT p.lang_a, p.lang_b, g.g AS gg, 1 AS a, 0 AS b
        FROM pairs p JOIN g ON g.lang = p.lang_a
        UNION ALL
        SELECT p.lang_a, p.lang_b, g.g AS gg, 0 AS a, 1 AS b
        FROM pairs p JOIN g ON g.lang = p.lang_b
      ) GROUP BY lang_a, lang_b, gg
    ),
    ex AS (
      SELECT lang_a, lang_b,
             CAST(COUNT(*) AS BIGINT) AS exact_union,
             CAST(SUM(a * b) AS BIGINT) AS exact_intersect
      FROM eg GROUP BY lang_a, lang_b
    )
    SELECT e.lang_a, e.lang_b,
           CASE WHEN e.m < {k} THEN CAST(e.m AS DOUBLE)
                ELSE {float(k - 1) * 2.0**60} / CAST(e.kth AS DOUBLE)
           END AS est_union,
           (CAST(e.n_common AS DOUBLE) / CAST(e.m AS DOUBLE))
             * CASE WHEN e.m < {k} THEN CAST(e.m AS DOUBLE)
                    ELSE {float(k - 1) * 2.0**60} / CAST(e.kth AS DOUBLE)
               END AS est_intersect,
           x.exact_union, x.exact_intersect
    FROM est e JOIN ex x USING (lang_a, lang_b)
    """


def vocab_coverage_sql(checkpoints=(100, 1000, 5000, 10000), n: int = 3) -> str:
    """Trigram-vocabulary coverage curve: what fraction of the corpus's
    n-gram stream is covered by the top-N vocabulary — the tokenizer-
    design measurement (rank by count desc, gram asc)."""
    cps = ",".join(str(c) for c in checkpoints)
    toks = tokens("text")
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS t FROM documents),
    tg AS (SELECT unnest({shingles('t', n)}) AS g FROM t),
    counts AS (SELECT g, COUNT(*) AS cnt FROM tg GROUP BY g),
    ranked AS (
      SELECT g, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, g ASC) AS rnk
      FROM counts
    ),
    total AS (SELECT SUM(cnt) AS tot FROM counts)
    SELECT v.vocab_size,
           CAST(SUM(r.cnt) AS BIGINT) AS covered_tokens,
           CAST(MIN(t.tot) AS BIGINT) AS total_tokens,
           CAST(SUM(r.cnt) AS DOUBLE) / CAST(MIN(t.tot) AS DOUBLE) AS coverage
    FROM UNNEST([{cps}]) AS v(vocab_size)
    JOIN ranked r ON r.rnk <= v.vocab_size
    CROSS JOIN total t
    GROUP BY v.vocab_size
    """


def containment_pairs_sql(threshold: float = 0.5, max_bucket: int = 64) -> str:
    """Exact containment |A∩B| / min(|A|,|B|) over LSH candidate pairs —
    same CTE chain as the Jaccard verifier."""
    return f"""
    WITH {lsh_banded_cte(max_bucket)},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b USING (band, bucket)
      WHERE a.doc_id < b.doc_id
    ),
    sets AS (SELECT doc_id, list_distinct(s) AS ds FROM sh)
    SELECT doc_a, doc_b,
           len(list_intersect(x.ds, y.ds))
             / greatest(least(len(x.ds), len(y.ds)), 1) AS containment
    FROM cand JOIN sets x ON cand.doc_a = x.doc_id
              JOIN sets y ON cand.doc_b = y.doc_id
    WHERE len(list_intersect(x.ds, y.ds))
            / greatest(least(len(x.ds), len(y.ds)), 1) >= {threshold}
    """
