"""Close the regex_gp triangle: the ported count arms must equal the
REFERENCE'S OWN expected values (src/test/regress/expected/regex_gp.out)
— data, query, and result all the reference's, with Spark as the
engine under test (same three-way strategy as tests/test_rio_expected.py
and test_tsearch_expected.py)."""

from __future__ import annotations

import pytest

from cloudberry_spark.registry import all_queries
from tests.conftest import SF_DIR

#: (query, arm) -> count pinned from expected/regex_gp.out
EXPECTED = {
    ("regress_regexgp_like_battery", "total"): 17388,
    ("regress_regexgp_like_battery", "like_A_pct"): 621,
    ("regress_regexgp_like_battery", "op_A_pct"): 621,
    ("regress_regexgp_like_battery", "op_u_b_u"): 3240,
    ("regress_regexgp_notlike_battery", "not_like_A"): 16767,
    ("regress_regexgp_notlike_battery", "not_like_uA"): 17388,
    ("regress_regexgp_notlike_battery", "not_like_ub"): 14148,
    ("regress_regexgp_ilike_battery", "ilike_a"): 621,
    ("regress_regexgp_ilike_battery", "ilike_A"): 621,
    ("regress_regexgp_ilike_battery", "ilike_u_a_u"): 648,
    ("regress_regexgp_ilike_battery", "op_ci_a"): 621,
    ("regress_regexgp_ilike_battery", "op_ci_u_b"): 3240,
    ("regress_regexgp_ilike_battery", "not_ci_a"): 16767,
    ("regress_regexgp_ilike_battery", "not_ci_uA"): 16740,
    ("regress_regexgp_similar_to_battery", "not_sim_alt"): 16146,
    ("regress_regexgp_similar_to_battery", "not_sim_A"): 16767,
    ("regress_regexgp_similar_to_battery", "not_sim_B"): 16767,
    ("regress_regexgp_similar_to_battery", "not_sim_star_A"): 17388,
    ("regress_regexgp_similar_to_battery", "not_sim_plus_alt"): 17388,
    ("regress_regexgp_similar_to_battery", "not_sim_class_A"): 17388,
}


@pytest.mark.parametrize(
    "qname", sorted({q for q, _ in EXPECTED})
)
def test_regexgp_counts_match_reference(qname, spark):
    got = {
        r["arm"]: r["n"]
        for r in all_queries()[qname].fn(spark, SF_DIR).collect()
    }
    for (q, arm), want in EXPECTED.items():
        if q != qname:
            continue
        assert got[arm] == want, (
            f"{q}/{arm}: got {got[arm]}, reference expects {want}"
        )
