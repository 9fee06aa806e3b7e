"""Round-11 evidence harness: packed-int-id cooccurrence pair leg
vs the shipped string shape (NEGATIVE RESULT - the packed shape is
slower at both scales; BASELINE.md round-11). Oracle-identical by
assertion. Usage: python ab_cooc.py <sf_dir>
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
from hri_flink_pipeline_core_spark.session import get_spark
from hri_flink_pipeline_core_spark.operators.cache import checkpoint_small, release_persisted_intermediates
from hri_flink_pipeline_core_spark.operators import text as TX
from pyspark.sql import functions as F
import __spark_entry__ as m
sf_dir=sys.argv[1]
spark=get_spark("ab-cooc")

def packed(spark, sf_dir):
    from pyspark.sql import Window as SW
    docs = m._tp(spark, sf_dir, "documents")
    dt = (docs.select("doc_id", F.explode(TX.tokens(F.lower(F.col("text")))).alias("tok"))
          .distinct().transform(checkpoint_small))
    n_docs = docs.agg(F.count(F.lit(1)).alias("nd"))
    marg_all = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    marg = (marg_all.crossJoin(F.broadcast(n_docs))
            .filter((F.col("n_tok")>=10)&(F.col("n_tok")*2<=F.col("nd")))
            .select("tok","n_tok"))
    ids = marg.withColumn("tid", F.row_number().over(SW.orderBy("tok"))).transform(checkpoint_small)
    dti = dt.join(ids.select("tok","tid"), "tok").select("doc_id","tid")
    ai = dti.select("doc_id", F.col("tid").alias("ta"))
    bi = dti.select("doc_id", F.col("tid").alias("tb"))
    bothp = (ai.join(bi, "doc_id").filter(F.col("ta")<F.col("tb"))
             .select((F.shiftleft(F.col("ta").cast("long"),32)+F.col("tb")).alias("pk"))
             .groupBy("pk").agg(F.count(F.lit(1)).alias("n_both"))
             .filter(F.col("n_both")>=10))
    both = bothp.select(
        F.shiftright(F.col("pk"),32).cast("int").alias("ta"),
        F.expr("CAST(pk & 4294967295 AS INT)").alias("tb"),
        "n_both")
    ia = ids.select(F.col("tid").alias("ta"), F.col("tok").alias("tok_a"), F.col("n_tok").alias("n_a"))
    ib = ids.select(F.col("tid").alias("tb"), F.col("tok").alias("tok_b"), F.col("n_tok").alias("n_b"))
    scored = (both.join(ia,"ta").join(ib,"tb").crossJoin(F.broadcast(n_docs))
              .select("tok_a","tok_b","n_both","n_a","n_b",
                      F.expr("(CAST(n_both AS DECIMAL(38,0)) * nd * 1000000) div (n_a * n_b)").alias("lift_q")))
    return m._topk_ranked(scored,[F.col("lift_q").desc(),F.col("tok_a"),F.col("tok_b")],20,"lift_rank")

qs=m.queries()
old=qs["cooccurrence_lift"](spark, sf_dir).toPandas(); release_persisted_intermediates()
new=packed(spark, sf_dir).toPandas(); release_persisted_intermediates()
cols=sorted(old.columns)
assert old[cols].sort_values(by=cols, ignore_index=True).equals(new[cols].sort_values(by=cols, ignore_index=True)), (old,new)
print("MATCH")
res={"strings":9e9,"packed":9e9}
for p in range(3):
    spark.catalog.clearCache()
    t0=time.perf_counter(); qs["cooccurrence_lift"](spark, sf_dir).toPandas(); res["strings"]=min(res["strings"],time.perf_counter()-t0)
    release_persisted_intermediates()
    spark.catalog.clearCache()
    t0=time.perf_counter(); packed(spark, sf_dir).toPandas(); res["packed"]=min(res["packed"],time.perf_counter()-t0)
    release_persisted_intermediates()
print("RESULT", sf_dir, {k:round(v,3) for k,v in res.items()})
