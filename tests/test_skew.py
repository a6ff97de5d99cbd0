"""Salted join/agg equivalence with the plain operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from elastic_surv_spark.operators.skew import salted_agg, salted_join
from elastic_surv_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain(spark):
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .toPandas()
        .set_index("c_mktsegment")["n"]
        .to_dict()
    )
    salted = (
        salted_join(o.withColumnRenamed("o_custkey", "c_custkey"), c, "c_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .toPandas()
        .set_index("c_mktsegment")["n"]
        .to_dict()
    )
    assert salted == plain and len(plain) > 0


def test_salted_agg_equals_plain(spark):
    li = load_table(spark, SF, "lineitem")
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("q"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .toPandas()
        .set_index("l_returnflag")
        .to_dict("index")
    )
    salted = (
        salted_agg(
            li,
            "l_returnflag",
            {
                "n": F.count("*"),
                "q": F.sum("l_quantity"),
                "lo": F.min("l_extendedprice"),
                "hi": F.max("l_extendedprice"),
            },
            n_salts=8,
        )
        .toPandas()
        .set_index("l_returnflag")
        .to_dict("index")
    )
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k]["n"] == salted[k]["n"]
        assert abs(plain[k]["q"] - salted[k]["q"]) < 1e-6
        assert plain[k]["lo"] == salted[k]["lo"]
        assert plain[k]["hi"] == salted[k]["hi"]
