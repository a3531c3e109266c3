"""tag.sql ports — object-tag governance queries over operators/tags.py.

Reference: src/test/regress/sql/tag.sql (635 lines). The
result-bearing catalog probes are ported; the large error matrix
(duplicate names/values, >300-value lists, overlong values, empty
strings, duplicate TAG() keys, disallowed values) is pinned loud in
tests/test_tags.py.

Exclusions (MIGRATION.md): cross-database \\c visibility re-probes
(tags are cluster-global in the reference; one catalog here), OWNER
TO / pg_authid joins (role ownership — the privileges family covers
ACLs), and \\d+ output formatting."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cloudberry_spark.operators.tags import TagCatalog
from cloudberry_spark.registry import register


def _catalog(spark: SparkSession) -> TagCatalog:
    cat = TagCatalog(spark)
    # tag.sql:6-13
    cat.create_tag("tag1")
    cat.create_tag("tag1", if_not_exists=True)
    cat.create_tag("tag2", if_not_exists=True)
    cat.create_tag("tag3", allowed_values=["123"])
    cat.create_tag("tag4", allowed_values=["123", "456", " "])
    cat.create_tag("tag5", allowed_values=["123", "val1"],
                   if_not_exists=True)
    return cat


@register(
    "regress_tag_catalog",
    oracle="""
SELECT * FROM (VALUES
  ('tag1', CAST(NULL AS VARCHAR)),
  ('tag2', CAST(NULL AS VARCHAR)),
  ('tag3', '123'),
  ('tag4', '123,456, '),
  ('tag5', '123,val1')
) t(tagname, allowed_values) ORDER BY tagname
""",
    doc="tag.sql:6-60 — CREATE TAG with and without ALLOWED_VALUES "
    "(IF NOT EXISTS skips duplicates silently); the pg_tag catalog "
    "lists each tag with its value list.",
    tags=("regress", "tag", "ddl"),
)
def regress_tag_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _catalog(spark).pg_tag().orderBy("tagname")


@register(
    "regress_tag_alter_lifecycle",
    oracle="""
SELECT * FROM (VALUES
  ('tag1', 'val1,val2,val3,val4,val5, '),
  ('tag2', CAST(NULL AS VARCHAR)),
  ('tag3_renamed', CAST(NULL AS VARCHAR)),
  ('tag4', '123,456, '),
  ('tag5', '123,val1')
) t(tagname, allowed_values) ORDER BY tagname
""",
    doc="tag.sql:66-115 — ALTER TAG RENAME, UNSET ALLOWED_VALUES "
    "(tag3's list dropped), and incremental ADD ALLOWED_VALUES "
    "(val1..val5 plus the bare-space value; duplicates and empties "
    "error — pinned in tests/test_tags.py).",
    tags=("regress", "tag", "ddl"),
)
def regress_tag_alter_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _catalog(spark)
    cat.rename_tag("tag3", "tag3_new")
    cat.rename_tag("tag3_new", "tag3_renamed")
    cat.unset_allowed_values("tag3_renamed")
    cat.add_allowed_values("tag1", ["val1"])
    cat.add_allowed_values("tag1", ["val2", "val3"])
    cat.add_allowed_values("tag1", ["val4", "val5"])
    cat.add_allowed_values("tag1", [" "])
    return cat.pg_tag().orderBy("tagname")


@register(
    "regress_tag_describe_objects",
    oracle="""
SELECT * FROM (VALUES
  ('database', 'tag_db1', 'tag1', 'val1'),
  ('database', 'tag_db2', 'tag1', 'val1'),
  ('database', 'tag_db2', 'tag2', '10'),
  ('database', 'tag_db4', 'tag1', 'val1'),
  ('database', 'tag_db4', 'tag4', ''),
  ('table', 'orders', 'tag4', ' '),
  ('table', 'orders', 'tag5', 'val1')
) t(objtype, objname, tagname, tagvalue)
ORDER BY objtype, objname, tagname
""",
    doc="tag.sql:261-276 — objects tagged at CREATE time: values "
    "validate against ALLOWED_VALUES lists ('novalue' errors, pinned "
    "in tests/test_tags.py), '' attaches the tag with no value even "
    "under a list, and pg_tag_description lists every attachment.",
    tags=("regress", "tag", "ddl"),
)
def regress_tag_describe_objects(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _catalog(spark)
    cat.add_allowed_values("tag1", ["val1", "val2"])
    cat.add_allowed_values("tag2", ["1", "3", "10", "300"])
    cat.tag_object("database", "tag_db1", [("tag1", "val1")])
    cat.tag_object("database", "tag_db2",
                   [("tag1", "val1"), ("tag2", "10")])
    cat.tag_object("database", "tag_db4",
                   [("tag1", "val1"), ("tag4", "")])
    cat.tag_object("table", "orders",
                   [("tag4", " "), ("tag5", "val1")])
    return cat.pg_tag_description().orderBy(
        "objtype", "objname", "tagname"
    )


@register(
    "regress_tag_untag_and_join",
    oracle="""
SELECT * FROM (VALUES
  ('table', 'lineitem', 'tag3', '123', '123')
) t(objtype, objname, tagname, tagvalue, allowed_values)
""",
    doc="tag.sql ALTER ... UNSET TAG tier — detaching one tag keeps "
    "the others; the description joins back to pg_tag for governance "
    "reports (which objects carry which allowed list).",
    tags=("regress", "tag", "ddl"),
)
def regress_tag_untag_and_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _catalog(spark)
    cat.tag_object("table", "lineitem",
                   [("tag3", "123"), ("tag2", "")])
    cat.untag_object("table", "lineitem", "tag2")
    desc = cat.pg_tag_description()
    return desc.join(cat.pg_tag(), "tagname").selectExpr(
        "objtype", "objname", "tagname", "tagvalue", "allowed_values"
    )
