"""Dimension decode / reference set / FULLNETWORKNAME tests (SURVEY §2 A9-A11)."""

from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.functions.decode import (
    build_dims,
    decode_join,
    full_network_name,
    reference_set_contains,
)


def test_decode_join_with_default(spark):
    dims = build_dims(spark)
    df = spark.createDataFrame([(0,), (4,), (99,)], ["domainId"])
    out = decode_join(df, dims["dim_domain"], "domainId", "domainId", "domainName",
                      "domainName", default="unknown")
    got = {r["domainId"]: r["domainName"] for r in out.collect()}
    assert got == {0: "customer_0", 4: "customer_4", 99: "unknown"}


def test_device_type_dim_has_custom_rule_engine(spark):
    dims = build_dims(spark)
    r = dims["dim_device_type"].where(F.col("devicetype") == 0).first()
    assert r["log_source_type_name"] == "Custom Rule Engine"


def test_reference_set_contains(spark):
    # REFERENCESETCONTAINS('Known DNS traffic', destinationIP)
    # (reference qradar/input/queries.json:2)
    refs = spark.createDataFrame(
        [("Known DNS traffic", "8.8.8.8"), ("Known DNS traffic", "1.1.1.1"),
         ("Other Set", "9.9.9.9")],
        ["set_name", "value"],
    )
    df = spark.createDataFrame([("8.8.8.8",), ("9.9.9.9",), ("5.5.5.5",)], ["dst"])
    inside = reference_set_contains(df, refs, "Known DNS traffic", "dst")
    assert {r["dst"] for r in inside.collect()} == {"8.8.8.8"}
    outside = reference_set_contains(df, refs, "Known DNS traffic", "dst", negate=True)
    assert {r["dst"] for r in outside.collect()} == {"9.9.9.9", "5.5.5.5"}


def test_full_network_name_longest_prefix_and_other(spark):
    nets = spark.createDataFrame(
        [(0, "10.0.0.0", 8, "corp"),
         (0, "10.1.0.0", 16, "corp-dc1"),
         (1, "10.0.0.0", 8, "tenant1-net")],
        ["domainId", "cidr", "prefix_len", "network_name"],
    )
    df = spark.createDataFrame(
        [(0, "10.1.2.3"), (0, "10.9.9.9"), (0, "8.8.8.8"), (1, "10.1.2.3")],
        ["domainId", "ip"],
    )
    out = full_network_name(df, nets, "ip", "net", domain_col="domainId")
    got = {(r["domainId"], r["ip"]): r["net"] for r in out.collect()}
    assert got == {
        (0, "10.1.2.3"): "corp-dc1",   # longest prefix wins
        (0, "10.9.9.9"): "corp",
        (0, "8.8.8.8"): "other",       # default used as a value (and in predicates)
        (1, "10.1.2.3"): "tenant1-net",  # domain-scoped
    }
    assert out.count() == 4  # no row duplication from multi-match
