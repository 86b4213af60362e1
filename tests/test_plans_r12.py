"""Plan-quality pins for the round-12 continuation operators: the
physical properties that make them scale are asserted, not hoped for."""

import re

from trollflow2_spark.queries import QUERIES


def plan_of(spark, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def _exchanges(plan):
    # AQE may rewrite; count distinct Exchange operator headers
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_point_in_polygon_zero_shuffle(spark, sf_dir):
    plan = plan_of(spark, "point_in_polygon", sf_dir)
    assert _exchanges(plan) == 0  # parity compiled into the scan stage
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_geohash_zero_shuffle_no_python(spark, sf_dir):
    plan = plan_of(spark, "geohash_encode", sf_dir)
    assert _exchanges(plan) == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_access_log_parse_scan_stage_only(spark, sf_dir):
    plan = plan_of(spark, "access_log_parse", sf_dir)
    assert _exchanges(plan) == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_luhn_audit_scan_stage_only(spark, sf_dir):
    plan = plan_of(spark, "luhn_audit", sf_dir)
    assert _exchanges(plan) == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" in plan  # the candidate explode, still pre-shuffle


def test_activity_streaks_single_exchange(spark, sf_dir):
    # window and agg share the user key: one exchange end to end
    plan = plan_of(spark, "activity_streaks", sf_dir)
    assert _exchanges(plan) == 1
    assert "Window" in plan


def test_touch_attribution_single_exchange(spark, sf_dir):
    plan = plan_of(spark, "touch_attribution", sf_dir)
    assert _exchanges(plan) == 1
    assert "Window" in plan
    assert "Join" not in plan  # range frame, not a time-band self-join


def test_winsorized_single_exchange_partial_agg(spark, sf_dir):
    plan = plan_of(spark, "winsorized_stats", sf_dir)
    assert _exchanges(plan) == 1
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_linear_trend_two_agg_layers(spark, sf_dir):
    plan = plan_of(spark, "linear_trend", sf_dir)
    # daily rollup keyed (priority, day) then trend keyed (priority):
    # two exchanges max, both hash aggs map-side-combinable
    assert _exchanges(plan) <= 2
    assert plan.count("HashAggregate") >= 4
    assert "BatchEvalPython" not in plan


def test_posting_lists_prefix_partitioning(spark, sf_dir):
    plan = plan_of(spark, "posting_lists", sf_dir)
    # (term, doc) agg then term window: at most two exchanges,
    # no Python anywhere
    assert _exchanges(plan) <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_join_audit_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, "join_cardinality_audit", sf_dir)
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # key profiles map-side


def test_link_prediction_no_cartesian_broadcast_degrees(spark, sf_dir):
    # r13: the degree tables carry NO forced broadcast hint (they are
    # node-cardinality — a forced broadcast is a 100 TB job-killer);
    # the pin asserts AQE still picks a broadcast join at this size
    # on its own, and that no hint appears in the analyzed plan
    plan = plan_of(spark, "link_prediction", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # AQE's choice, unhinted
    from trollflow2_spark.queries import QUERIES

    analyzed = QUERIES["link_prediction"](spark, sf_dir)._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in analyzed and "ResolvedHint" not in analyzed
