"""Unit tests for the AQL scalar-function library (SURVEY §5 item 3)."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.functions import (
    epoch_to_ts,
    incidr,
    ip_to_long,
    long_to_ip,
    network_name_expr,
    prev_saturday,
    report_date,
    week_from,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


class TestIp:
    def test_ip_to_long_roundtrip(self, spark):
        rows = spark.createDataFrame(
            [("0.0.0.0",), ("255.255.255.255",), ("10.1.2.3",), ("192.168.0.1",)],
            ["ip"],
        ).select(
            "ip",
            ip_to_long("ip").alias("n"),
            long_to_ip(ip_to_long("ip")).alias("back"),
        ).collect()
        for r in rows:
            assert r["back"] == r["ip"]
        vals = {r["ip"]: r["n"] for r in rows}
        assert vals["0.0.0.0"] == 0
        assert vals["255.255.255.255"] == 0xFFFFFFFF
        assert vals["10.1.2.3"] == (10 << 24) + (1 << 16) + (2 << 8) + 3

    def test_ip_to_long_malformed(self, spark):
        rows = spark.createDataFrame(
            [("999.1.1.1",), ("not-an-ip",), ("1.2.3",), (None,)], ["ip"]
        ).select(ip_to_long("ip").alias("n")).collect()
        assert all(r["n"] is None for r in rows)

    def test_incidr_truth_table(self, spark):
        # CIDR literals from reference qradar/input/queries.json:2 + FIXTURES A5
        # boundary IPs.
        cases = [
            ("10.0.0.0/8", "10.0.0.0", True),
            ("10.0.0.0/8", "10.255.255.255", True),
            ("10.0.0.0/8", "11.0.0.0", False),
            ("172.16.0.0/12", "172.15.255.255", False),
            ("172.16.0.0/12", "172.16.0.0", True),
            ("172.16.0.0/12", "172.31.255.255", True),
            ("172.16.0.0/12", "172.32.0.0", False),
            ("192.168.0.0/16", "192.168.44.3", True),
            ("192.168.0.0/16", "192.169.0.0", False),
            ("169.254.0.0/16", "169.254.1.1", True),
            ("127.0.0.0/8", "127.0.0.1", True),
            ("0.0.0.0/8", "0.1.2.3", True),
            ("0.0.0.0/8", "1.0.0.0", False),
            ("10.0.0.0/8", "garbage", False),  # malformed IP tests False
        ]
        df = spark.createDataFrame([(c, i, e) for c, i, e in cases], ["cidr", "ip", "want"])
        for cidr in {c for c, _, _ in cases}:
            got = (
                df.where(F.col("cidr") == cidr)
                .select("ip", "want", incidr(cidr, F.col("ip")).alias("got"))
                .collect()
            )
            for r in got:
                assert r["got"] == r["want"], (cidr, r["ip"])

    def test_network_name_expr_longest_prefix(self, spark):
        nets = [("10.0.0.0/8", 8, "corp"), ("10.1.0.0/16", 16, "corp-dc1")]
        df = spark.createDataFrame(
            [("10.1.2.3",), ("10.2.2.3",), ("8.8.8.8",)], ["ip"]
        ).select("ip", network_name_expr(ip_to_long("ip"), nets).alias("net"))
        got = {r["ip"]: r["net"] for r in df.collect()}
        assert got == {"10.1.2.3": "corp-dc1", "10.2.2.3": "corp", "8.8.8.8": "other"}


class TestDates:
    def test_epoch_autodetect_boundary(self, spark):
        # > 1e10 → milliseconds; ≤ 1e10 → seconds (clickhouse/helpers.py:74-76)
        df = spark.createDataFrame(
            [(10_000_000_000,), (10_000_000_001,), (1_700_000_000,), (1_700_000_000_000,)],
            ["t"],
        ).select("t", epoch_to_ts("t").alias("ts"))
        got = {r["t"]: r["ts"] for r in df.collect()}
        assert got[10_000_000_000].year == 2286  # treated as seconds
        assert got[10_000_000_001].year == 1970  # treated as ms
        assert got[1_700_000_000] == got[1_700_000_000_000]

    def test_week_from_saturday_maps_to_itself(self, spark):
        # 2024-07-20 is a Saturday; relativedelta(weekday=SA(-1)) keeps it
        # (reference clickhouse/helpers.py:79). 2024-07-21 (Sun) → 20/07/2024.
        df = spark.createDataFrame(
            [(datetime.datetime(2024, 7, 20, 12, 0),),
             (datetime.datetime(2024, 7, 21, 0, 1),),
             (datetime.datetime(2024, 7, 26, 23, 59),)],
            ["ts"],
        ).select("ts", week_from("ts").alias("wf"), report_date("ts").alias("rd"))
        rows = df.collect()
        assert rows[0]["wf"] == "20/07/2024" and rows[0]["rd"] == "20/07/2024"
        assert rows[1]["wf"] == "20/07/2024"
        assert rows[2]["wf"] == "20/07/2024"

    def test_prev_saturday_every_weekday(self, spark):
        base = datetime.date(2024, 7, 20)  # Saturday
        days = [(datetime.datetime(2024, 7, 20 + i, 6, 0),) for i in range(7)]
        df = spark.createDataFrame(days, ["ts"]).select(prev_saturday("ts").alias("p"))
        assert all(r["p"] == base for r in df.collect())
