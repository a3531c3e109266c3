"""partition1.sql validation corpus pinned loud against
operators/partition_spec.py (error texts from
expected/partition1.out)."""

from __future__ import annotations

from datetime import date

import pytest

from cloudberry_spark.operators.partition_spec import (
    GpPartitionedTable,
    PartitionSpecError,
)

COLS = "a STRING, b DATE, d STRING"


def _mk(spark, spec, cols=COLS, name="e1"):
    return GpPartitionedTable(spark, name, cols, spec)


def test_list_missing_boundary(spark):
    # partition1.sql:8 / .out:8
    with pytest.raises(PartitionSpecError,
                       match='missing boundary specification in '
                             'partition "aa" of type LIST'):
        _mk(spark, "partition by LIST (b) (partition aa, "
                   "partition bb values ('x'))")


def test_list_range_spec_invalid(spark):
    # partition1.sql:14 / .out:15
    with pytest.raises(PartitionSpecError,
                       match="invalid boundary specification for "
                             "LIST partition"):
        _mk(spark, "partition by LIST (b) (partition aa "
                   "start (date '2007-01-01'))")


def test_mixed_named_unnamed_derivation(spark):
    # partition1.sql:24-34 / .out:34 — the comma before `end` makes an
    # anonymous start-less entry; deriving aa's end from it fails
    with pytest.raises(PartitionSpecError,
                       match="cannot derive ending value"):
        _mk(spark, "partition by range (b) ("
                   "partition aa start (date '2007-01-01'), "
                   "end (date '2008-01-01'))")


def test_range_too_many_columns(spark):
    # partition1.sql:80 / .out:82
    with pytest.raises(PartitionSpecError,
                       match="too many columns for RANGE partition"):
        _mk(spark, "partition by range (b,d) "
                   "(partition aa start (1) end (2))")


def test_start_arity_mismatch(spark):
    # partition1.sql:91 / .out:93
    with pytest.raises(PartitionSpecError,
                       match="number of START values"):
        _mk(spark, "partition by range (b) "
                   "(partition aa start (1, 2) end (3, 4))")


def test_duplicate_partition_name(spark):
    # .out:280
    with pytest.raises(PartitionSpecError,
                       match='relation "e1_1_prt_girls" already '
                             "exists"):
        _mk(spark, "partition by list (b) ("
                   "partition girls values ('a'), "
                   "partition girls values ('b'))")


def test_inclusive_end_overlap(spark):
    # partition1.sql:247-253 — end INCLUSIVE meeting an inclusive
    # start overlaps, naming both children (.out:315)
    with pytest.raises(PartitionSpecError, match="would overlap"):
        _mk(spark, "partition by range (b) ("
                   "partition aa start (date '2007-01-01') "
                   "end (date '2008-01-01') inclusive, "
                   "partition bb start (date '2008-01-01') "
                   "end (date '2009-01-01'))")


def test_exclusive_start_resolves_overlap(spark):
    # partition1.sql:263-269 — legal because bb's start is exclusive
    t = _mk(spark, "partition by range (b) ("
                   "partition aa start (date '2007-08-01') "
                   "end (date '2008-01-01') inclusive, "
                   "partition bb start (date '2008-01-01') exclusive "
                   "end (date '2008-03-01'))")
    assert len(t.leaf_bounds()) == 2


def test_empty_range_bound(spark):
    # .out:364 — start greater than end
    with pytest.raises(PartitionSpecError,
                       match='empty range bound specified for '
                             'partition "e1_1_prt_aa"'):
        _mk(spark, "partition by range (b) ("
                   "partition bb start (date '2008-01-01') "
                   "end (date '2009-01-01'), "
                   "partition aa start (date '2007-01-01') "
                   "end (date '2006-01-01'))")


def test_no_partition_for_key(spark):
    # the foz COPY battery: 2010 row has no partition
    t = _mk(spark, "partition by range (b) "
                   "(start (date '2001-01-01') "
                   "end (date '2005-01-01') every(interval '1 year'))")
    with pytest.raises(PartitionSpecError,
                       match="no partition for partitioning key"):
        t.insert_values([("x", date(2010, 1, 1), None)])


def test_default_partition_rules(spark):
    # default must be named, refuses bounds, only one allowed
    with pytest.raises(PartitionSpecError, match="missing name"):
        _mk(spark, "partition by range(b) ("
                   "partition j1 end (date '2008-01-01'), "
                   "default partition)")
    with pytest.raises(PartitionSpecError,
                       match="boundary specification in DEFAULT"):
        _mk(spark, "partition by range(b) ("
                   "partition j1 end (date '2008-01-01'), "
                   "default partition j3 end (date '2010-01-01'))")
    with pytest.raises(PartitionSpecError, match="multiple default"):
        _mk(spark, "partition by range(b) ("
                   "partition j1 end (date '2008-01-01'), "
                   "default partition j3, default partition j4)")


def test_start_only_chain_derives(spark):
    # the rank-template pattern: a chain of start-only entries derives
    # each end from the next start; the last stays open above
    t = _mk(spark, "partition by range (b) ("
                   "start (date '2007-01-01'), "
                   "start (date '2008-01-01'), "
                   "start (date '2009-01-01'))")
    assert len(t.leaf_bounds()) == 3
    preds = dict(t.leaf_bounds())
    assert "<" not in preds["e1_1_prt_3"]  # open above


def test_every_month_clamp(spark):
    # EVERY works by repeatedly invoking the + operator on the
    # PREVIOUS boundary (partition1.sql 'EVERY works by invoking the
    # + operator'), so the Jan-31 day clamps at Feb-29 and stays:
    # boundaries 01-31, 02-29, 03-29, 04-29, clipped at 04-30
    t = _mk(spark, "partition by range (b) ("
                   "start (date '2008-01-31') end (date '2008-04-30') "
                   "every (interval '1 month'))")
    leaves = [p for p, _ in t.leaf_bounds()]
    assert len(leaves) == 4
    assert "2008-02-29" in dict(t.leaf_bounds())["e1_1_prt_1_2"]


def test_add_partition_corpus(spark):
    # partition1.sql:700-790 / .out:743-790
    t = _mk(spark, "partition by range (b) ("
                   "partition aa start (date '2007-01-01') "
                   "end (date '2008-01-01'), "
                   "partition bb start (date '2008-01-01') "
                   "end (date '2009-01-01'))", name="hhh")
    with pytest.raises(PartitionSpecError,
                       match='relation "hhh_1_prt_aa" already exists'):
        t.add_partition("partition aa start (date '2010-01-01') "
                        "end (date '2011-01-01')")
    with pytest.raises(PartitionSpecError,
                       match='missing boundary specification in '
                             'partition "cc" of type RANGE'):
        t.add_partition("partition cc")
    with pytest.raises(PartitionSpecError,
                       match='"hhh_1_prt_cc" would overlap partition '
                             '"hhh_1_prt_bb"'):
        t.add_partition("partition cc start (date '2008-01-01') "
                        "end (date '2010-01-01')")
    with pytest.raises(PartitionSpecError,
                       match='would overlap partition "hhh_1_prt_aa"'):
        t.add_partition("partition cc end (date '2008-01-01')")
    with pytest.raises(PartitionSpecError,
                       match='empty range bound specified'):
        t.add_partition("partition cc start (date '2010-01-01') "
                        "end (date '2009-01-01')")
    t.add_partition("partition cc end (date '2010-01-01')")
    assert dict(t.leaf_bounds())["hhh_1_prt_cc"] == (
        "b >= DATE '2009-01-01' AND b < DATE '2010-01-01'")
    t.add_partition("end (date '2010-02-01')")  # anonymous, MPP-3350
    assert "hhh_1_prt_1" in dict(t.leaf_bounds())


def test_add_partition_open_intervals(spark):
    # MPP-3607 (.out:765-790): open-ended neighbours
    ne = _mk(spark, "partition by range (b) (partition foo start (3))",
             cols="a STRING, b INT", name="no_end1")
    for entry in ("partition baz end (4)", "partition baz start (5)"):
        with pytest.raises(PartitionSpecError,
                           match='would overlap partition '
                                 '"no_end1_1_prt_foo"'):
            ne.add_partition(entry)
    ne.add_partition("partition baz start (2)")  # terminates on foo
    assert dict(ne.leaf_bounds())["no_end1_1_prt_baz"] == (
        "b >= 2 AND b < 3")
    ne.add_partition("partition baz2 end (1)")   # ends before baz
    ns = _mk(spark, "partition by range (b) (partition foo end (3))",
             cols="a STRING, b INT", name="no_start1")
    for entry in ("partition baz start (2)", "partition baz end (1)"):
        with pytest.raises(PartitionSpecError, match="would overlap"):
            ns.add_partition(entry)
    ns.add_partition("partition baz end (4)")    # starts on foo end
    assert dict(ns.leaf_bounds())["no_start1_1_prt_baz"] == (
        "b >= 3 AND b < 4")


def test_add_default_conflict_and_drop(spark):
    t = _mk(spark, "partition by range (b) ("
                   "partition j1 end (date '2008-01-01'), "
                   "default partition j3)", name="jjj")
    with pytest.raises(PartitionSpecError,
                       match='"jjj_1_prt_j3" already exists'):
        t.add_partition("default partition j3")
    with pytest.raises(PartitionSpecError,
                       match='conflicts with existing default '
                             'partition "jjj_1_prt_j3"'):
        t.add_partition("default partition j4")
    # a BOUNDED add with a default present is fine (.out:838)
    t.add_partition("partition j5 start (date '2009-01-01') "
                    "end (date '2010-01-01')")
    t.drop_partition("j5")
    with pytest.raises(PartitionSpecError,
                       match='relation "public.jjj_1_prt_j5" does '
                             "not exist"):
        t.drop_partition("j5")
