"""Round-11 evidence harness: pagerank adjacency-shape node-list
checkpoint ON vs OFF at the 2-iteration default (OFF shipped -
BASELINE.md round-11). Identical results by assertion.
Usage: python ab_pr_nodes.py <sf_dir>
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
from hri_flink_pipeline_core_spark.session import get_spark
from hri_flink_pipeline_core_spark.operators.cache import checkpoint_small, release_persisted_intermediates
from pyspark.sql import functions as F
import __spark_entry__ as m
sf_dir=sys.argv[1]
spark=get_spark("ab-prn")

def adj2(edges, iterations=2, damping=0.85, base=0.15, quantum=1e12, ckpt_nodes=False):
    adj = (edges.select("src","dst")
           .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
           .groupBy("src").agg(F.collect_set("dst").alias("_dsts"))
           .select("src","_dsts",F.size("_dsts").alias("_d"))
           .transform(checkpoint_small))
    nodes = (adj.select(F.col("src").alias("node"))
             .unionByName(adj.select(F.explode("_dsts").alias("node")))
             .distinct())
    if ckpt_nodes: nodes = nodes.transform(checkpoint_small)
    rank = nodes.withColumn("pr", F.lit(1.0))
    for _i in range(iterations):
        contrib=(adj.join(rank.select(F.col("node").alias("src"),"pr"),"src")
                 .select(F.explode("_dsts").alias("dst"),
                         F.floor(F.col("pr")/F.col("_d")*F.lit(quantum)+F.lit(0.5)).cast("long").alias("_q")))
        sums=contrib.groupBy("dst").agg(F.sum("_q").alias("_sq"))
        rank=(nodes.join(sums.select(F.col("dst").alias("node"),"_sq"),"node","left")
              .select("node",(F.lit(base)+F.lit(damping)*(F.coalesce(F.col("_sq"),F.lit(0))/F.lit(quantum))).alias("pr")))
        if _i<iterations-1 and (_i+1)%2==0: rank=rank.transform(checkpoint_small)
    return rank.select("node",F.col("pr").alias("pagerank"))

def q(ck):
    o=m._t(spark,sf_dir,"orders")
    edges=o.select(F.expr("o_custkey % 997 + 997 * (o_custkey DIV 1000000)").alias("src"),
                   F.expr("o_orderkey % 997 + 997 * (o_orderkey DIV 1000000)").alias("dst")).filter(F.col("src")!=F.col("dst"))
    return adj2(edges, ckpt_nodes=ck)

a=q(True).toPandas(); release_persisted_intermediates()
b=q(False).toPandas(); release_persisted_intermediates()
assert a.sort_values(by=list(a.columns),ignore_index=True).equals(b.sort_values(by=list(b.columns),ignore_index=True))
print("MATCH")
res={"ckpt":9e9,"nockpt":9e9}
for p in range(3):
    spark.catalog.clearCache()
    t0=time.perf_counter(); q(True).toPandas(); res["ckpt"]=min(res["ckpt"],time.perf_counter()-t0); release_persisted_intermediates()
    spark.catalog.clearCache()
    t0=time.perf_counter(); q(False).toPandas(); res["nockpt"]=min(res["nockpt"],time.perf_counter()-t0); release_persisted_intermediates()
print("RESULT", sf_dir, {k:round(v,3) for k,v in res.items()})
