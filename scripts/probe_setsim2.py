"""r14 probe 2: time q_set_similarity_join variants end-to-end with the
noop sink. A = current operator; B = min-shared-prefix-bit uniqueness
(no dropDuplicates); C = distinct-mask collapse + min-bit + expand."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_log_analysis_spark.operators.dedup import (  # noqa: E402
    _jaccard_prefix,
    _rank_mask,
    _ranked_token_sets,
    set_similarity_join,
)
from hadoop_log_analysis_spark.session import get_spark  # noqa: E402
from hadoop_log_analysis_spark.sources.catalog import scan  # noqa: E402

T = 0.5


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def variant_a(docs):
    return set_similarity_join(docs, threshold=T).orderBy("a_id", "b_id")


def _masked_pref(ranked):
    """Prefix rows carrying both full mask and PREFIX mask."""
    pref_len = (
        F.size("ranks") - F.ceil(F.size("ranks") * F.lit(T)) + 1
    ).cast("int")
    with_masks = ranked.select(
        "id",
        _rank_mask().alias("mask"),
        F.slice("ranks", 1, pref_len).alias("pranks"),
    ).select(
        "id",
        "mask",
        F.expr(
            "aggregate(pranks, cast(0 as bigint), "
            "(acc, r) -> acc | shiftleft(cast(1 as bigint), r - 1))"
        ).alias("pmask"),
        "pranks",
    )
    from hadoop_log_analysis_spark.operators.partitioning import widen

    return widen(
        with_masks.select(
            "id", "mask", "pmask", F.explode("pranks").alias("ptok")
        )
    )


def variant_b(docs):
    ranked = _ranked_token_sets(docs, "text", "doc_id")
    pref = _masked_pref(ranked)
    a = pref.select(
        F.col("id").alias("a_id"),
        F.col("mask").alias("a_mask"),
        F.col("pmask").alias("a_pmask"),
        "ptok",
    )
    b = pref.select(
        F.col("id").alias("b_id"),
        F.col("mask").alias("b_mask"),
        F.col("pmask").alias("b_pmask"),
        "ptok",
    )
    shared = F.col("a_pmask").bitwiseAND(F.col("b_pmask"))
    jacc = F.expr("bit_count(a_mask & b_mask)").cast("double") / F.expr(
        "bit_count(a_mask | b_mask)"
    ).cast("double")
    return (
        a.join(b, "ptok")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            F.expr("shiftleft(cast(1 as bigint), ptok - 1)")
            == shared.bitwiseAND(-shared)
        )
        .withColumn("jacc", jacc)
        .filter(F.col("jacc") >= T)
        .select("a_id", "b_id", F.round("jacc", 4).alias("jacc"))
        .orderBy("a_id", "b_id")
    )


def variant_c(docs):
    ranked = _ranked_token_sets(docs, "text", "doc_id")
    masked = ranked.select(
        "id", "ranks", _rank_mask().alias("mask")
    )
    groups = masked.groupBy("mask").agg(
        F.first("ranks").alias("ranks"),
        F.collect_list("id").alias("ids"),
    ).localCheckpoint(eager=True)
    pref_len = (
        F.size("ranks") - F.ceil(F.size("ranks") * F.lit(T)) + 1
    ).cast("int")
    gp = groups.select(
        "mask",
        F.slice("ranks", 1, pref_len).alias("pranks"),
    ).select(
        "mask",
        F.expr(
            "aggregate(pranks, cast(0 as bigint), "
            "(acc, r) -> acc | shiftleft(cast(1 as bigint), r - 1))"
        ).alias("pmask"),
        "pranks",
    )
    from hadoop_log_analysis_spark.operators.partitioning import widen

    pref = widen(gp.select("mask", "pmask", F.explode("pranks").alias("ptok")))
    a = pref.select(
        F.col("mask").alias("a_mask"), F.col("pmask").alias("a_pmask"), "ptok"
    )
    b = pref.select(
        F.col("mask").alias("b_mask"), F.col("pmask").alias("b_pmask"), "ptok"
    )
    shared = F.col("a_pmask").bitwiseAND(F.col("b_pmask"))
    jacc = F.expr("bit_count(a_mask & b_mask)").cast("double") / F.expr(
        "bit_count(a_mask | b_mask)"
    ).cast("double")
    qual = (
        a.join(b, "ptok")
        .filter(F.col("a_mask") <= F.col("b_mask"))
        .filter(
            F.expr("shiftleft(cast(1 as bigint), ptok - 1)")
            == shared.bitwiseAND(-shared)
        )
        .withColumn("jacc", jacc)
        .filter(F.col("jacc") >= T)
        .select("a_mask", "b_mask", "jacc")
    )
    ga = groups.select(F.col("mask").alias("a_mask"), F.col("ids").alias("a_ids"))
    gb = groups.select(F.col("mask").alias("b_mask"), F.col("ids").alias("b_ids"))
    expanded = (
        qual.join(F.broadcast(ga), "a_mask")
        .join(F.broadcast(gb), "b_mask")
        .select(
            F.explode("a_ids").alias("x"), F.col("b_ids"), "jacc", "a_mask", "b_mask"
        )
        .select("x", F.explode("b_ids").alias("y"), "jacc", "a_mask", "b_mask")
        .filter(
            (F.col("a_mask") < F.col("b_mask")) | (F.col("x") < F.col("y"))
        )
        .select(
            F.least("x", "y").alias("a_id"),
            F.greatest("x", "y").alias("b_id"),
            F.round("jacc", 4).alias("jacc"),
        )
        .orderBy("a_id", "b_id")
    )
    return expanded


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-setsim2")
    spark.sparkContext.setLogLevel("ERROR")
    docs = scan(spark, sf, "documents")
    print(f"load_avg: {[round(x, 2) for x in os.getloadavg()]}")
    variants = {"A": variant_a, "B": variant_b, "C": variant_c}
    which = sys.argv[1:] or list(variants)
    for name in which:
        fn = variants[name]
        spark.sparkContext.setJobDescription(f"setsim-{name}: warm")
        noop(fn(docs))
        times = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"setsim-{name}: timed{i}")
            t0 = time.perf_counter()
            noop(fn(docs))
            times.append(time.perf_counter() - t0)
        print(
            f"RES {name} med={sorted(times)[1]:.2f}s all="
            f"{[round(x, 2) for x in times]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
