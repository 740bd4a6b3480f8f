"""SQL set-operator semantics on frames with asymmetric multiplicity.

Regression for q25: ``exceptAll().dropDuplicates()`` is NOT SQL
EXCEPT — a key present on both sides with higher multiplicity on the
left leaves leftCount-rightCount survivors in ``exceptAll`` which then
pass dedup, while EXCEPT removes the key entirely. ``subtract`` has
distinct EXCEPT semantics. The production tables (unique keys) could
never catch this; these fixtures can.
"""

from __future__ import annotations


def _frames(spark):
    left = spark.createDataFrame([(1,), (1,), (2,), (3,)], "key long")
    right = spark.createDataFrame([(1,), (3,)], "key long")
    return left, right


def test_subtract_is_sql_except(spark):
    left, right = _frames(spark)
    # key=1: multiplicity 2 on the left, 1 on the right — EXCEPT must
    # still remove it completely.
    assert [r.key for r in left.subtract(right).collect()] == [2]


def test_exceptall_dropdup_diverges(spark):
    # Documents WHY q25 needed the fix: the old formulation keeps
    # key=1 on this fixture.
    left, right = _frames(spark)
    old = sorted(r.key for r in left.exceptAll(right).dropDuplicates().collect())
    assert old == [1, 2]  # wrong under EXCEPT semantics — the trap


def test_intersect_is_distinct(spark):
    left, right = _frames(spark)
    assert sorted(r.key for r in left.intersect(right).collect()) == [1, 3]
