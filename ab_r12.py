"""Round-12 generic A/B evidence harness: shipped query vs candidate
variant(s), identical-output asserted, interleaved min-of-3 cold-cache
timings (same methodology as ab_cooc.py / bench_sfscale.py warm-marginal).

Usage: python ab_r12.py <variant_name> <sf_dir> [rounds]
Variants live in VARIANTS below: name -> (query_key, candidate_fn).
"""

import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as m
from hri_flink_pipeline_core_spark.operators import text as TX
from hri_flink_pipeline_core_spark.operators.cache import (
    checkpoint_small,
    release_persisted_intermediates,
)
from hri_flink_pipeline_core_spark.session import get_spark


def cooc_marg_ckpt(spark, sf_dir):
    """cooccurrence_lift with the tiny band-passed marginal table and the
    1-row corpus count checkpointed: the shipped plan recomputes `marg`
    (groupBy(tok) over the checkpointed (doc,token) leaf) once per
    consumer (semi-join build + both marginal join sides) and re-scans
    documents.parquet once per n_docs consumer (guide section 2.4:
    remove repeated exchanges outright; both tables are kilobytes)."""
    docs = m._tp(spark, sf_dir, "documents")
    dt = (
        docs.select(
            "doc_id", F.explode(TX.tokens(F.lower(F.col("text")))).alias("tok")
        )
        .distinct()
        .transform(checkpoint_small)
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("nd")).transform(checkpoint_small)
    marg_all = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    marg = (
        marg_all.crossJoin(F.broadcast(n_docs))
        .filter((F.col("n_tok") >= 10) & (F.col("n_tok") * 2 <= F.col("nd")))
        .select("tok", "n_tok")
        .transform(checkpoint_small)
    )
    dtb = dt.join(marg.select("tok"), "tok", "left_semi")
    a = dtb.select("doc_id", F.col("tok").alias("tok_a"))
    b = dtb.select("doc_id", F.col("tok").alias("tok_b"))
    both = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 10)
    )
    ma = marg.select(F.col("tok").alias("tok_a"), F.col("n_tok").alias("n_a"))
    mb = marg.select(F.col("tok").alias("tok_b"), F.col("n_tok").alias("n_b"))
    scored = (
        both.join(ma, "tok_a")
        .join(mb, "tok_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr(
                "(CAST(n_both AS DECIMAL(38,0)) * nd * 1000000)"
                " div (n_a * n_b)"
            ).alias("lift_q"),
        )
    )
    return m._topk_ranked(
        scored,
        [F.col("lift_q").desc(), F.col("tok_a"), F.col("tok_b")],
        20,
        "lift_rank",
    )


VARIANTS = {
    "cooc_marg_ckpt": ("cooccurrence_lift", cooc_marg_ckpt),
}


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    key, cand = VARIANTS[name]
    spark = get_spark(f"ab-{name}")
    qs = m.queries()

    old = qs[key](spark, sf_dir).toPandas()
    release_persisted_intermediates()
    spark.catalog.clearCache()
    new = cand(spark, sf_dir).toPandas()
    release_persisted_intermediates()
    spark.catalog.clearCache()
    cols = sorted(old.columns)
    assert old[cols].sort_values(by=cols, ignore_index=True).equals(
        new[cols].sort_values(by=cols, ignore_index=True)
    ), (old, new)
    print("MATCH")

    res = {"shipped": 9e9, "candidate": 9e9}
    for _ in range(rounds):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).toPandas()
        res["shipped"] = min(res["shipped"], time.perf_counter() - t0)
        release_persisted_intermediates()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        cand(spark, sf_dir).toPandas()
        res["candidate"] = min(res["candidate"], time.perf_counter() - t0)
        release_persisted_intermediates()
    print("RESULT", name, sf_dir, {k: round(v, 3) for k, v in res.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
