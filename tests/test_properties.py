"""Property-based tests (hypothesis): the scalar library vs Python stdlib oracles.

Batched: hypothesis generates the cases, ONE Spark job evaluates them all —
per-example Spark jobs would be 1000× slower than the properties are worth.
"""

import datetime
import ipaddress

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.functions import incidr, ip_to_long, prev_saturday
from qradar_restapi_kafka_datapipeline_spark.operators.normalize import clean_column_name

ips = st.integers(min_value=0, max_value=0xFFFFFFFF).map(
    lambda n: str(ipaddress.IPv4Address(n))
)
cidrs = st.tuples(
    st.integers(min_value=0, max_value=0xFFFFFFFF), st.integers(min_value=0, max_value=32)
).map(lambda t: f"{ipaddress.IPv4Address(t[0])}/{t[1]}")


class TestIncidrVsStdlib:
    """One big batch: 300 random (cidr, ip) cases vs `ipaddress` truth."""

    def test_incidr_matches_ipaddress(self, spark):
        cases = []
        gen = st.tuples(cidrs, ips)

        @settings(max_examples=300, deadline=None, database=None)
        @given(gen)
        def collect(case):
            cases.append(case)

        collect()
        rows = [
            (cidr, ip,
             ipaddress.IPv4Address(ip) in ipaddress.IPv4Network(cidr, strict=False))
            for cidr, ip in cases
        ]
        df = spark.createDataFrame(rows, ["cidr", "ip", "want"])
        # evaluate per distinct cidr literal (incidr folds the literal)
        for cidr in {c for c, _, _ in rows}:
            got = (
                df.where(F.col("cidr") == cidr)
                .select("ip", "want", incidr(cidr, F.col("ip")).alias("got"))
                .collect()
            )
            for r in got:
                assert r["got"] == r["want"], (cidr, r["ip"])

    def test_ip_to_long_matches_ipaddress(self, spark):
        sample = [str(ipaddress.IPv4Address(n)) for n in
                  range(0, 0xFFFFFFFF, 0x01234567)] + ["255.255.255.255"]
        df = spark.createDataFrame([(s,) for s in sample], ["ip"])
        got = {r["ip"]: r["n"] for r in df.select("ip", ip_to_long("ip").alias("n")).collect()}
        for ip in sample:
            assert got[ip] == int(ipaddress.IPv4Address(ip))


def test_prev_saturday_matches_dateutil_semantics(spark):
    """relativedelta(weekday=SA(-1)) parity over 400 consecutive days
    (reference clickhouse/helpers.py:79)."""
    base = datetime.date(2023, 12, 1)
    days = [base + datetime.timedelta(days=i) for i in range(400)]
    df = spark.createDataFrame(
        [(datetime.datetime(d.year, d.month, d.day, 13, 30),) for d in days], ["ts"]
    )
    got = [r["p"] for r in df.select(prev_saturday("ts").alias("p")).collect()]
    for d, p in zip(days, got):
        # python truth: step back (weekday+2) % 7 days; Mon=0..Sun=6 → Sat maps to itself
        expect = d - datetime.timedelta(days=(d.weekday() + 2) % 7)
        assert p == expect, d


@given(st.text(min_size=0, max_size=40))
@settings(max_examples=200, deadline=None, database=None)
def test_clean_column_name_idempotent_and_complete(name):
    cleaned = clean_column_name(name)
    assert clean_column_name(cleaned) == cleaned  # idempotent
    for ch in " /(),":
        assert ch not in cleaned
