"""tag.sql's error matrix pinned loud against operators/tags.py."""

from __future__ import annotations

import pytest

from cloudberry_spark.operators.tags import TagCatalog, TagError


@pytest.fixture()
def cat(spark):
    c = TagCatalog(spark)
    c.create_tag("tag1", allowed_values=["val1"])
    return c


def test_duplicate_tag_name(cat):
    with pytest.raises(TagError, match="already exists"):
        cat.create_tag("tag1")  # tag.sql:9


def test_duplicate_allowed_values(cat):
    with pytest.raises(TagError, match="duplicate"):
        cat.create_tag("tag7", allowed_values=["val1", "123", "val1"])


def test_over_300_values(cat):
    with pytest.raises(TagError, match="300"):
        cat.create_tag("tag9",
                       allowed_values=[str(i) for i in range(1, 302)])
    cat.create_tag("tag8", allowed_values=[str(i) for i in range(1, 301)])


def test_overlong_value(cat):
    with pytest.raises(TagError, match="256"):
        cat.create_tag("tag6", allowed_values=["x" * 430])  # tag.sql:14


def test_empty_string_value_rejected(cat):
    with pytest.raises(TagError, match="duplicate"):
        cat.add_allowed_values("tag1", ["", ""])  # tag.sql:108 (dup '')
    with pytest.raises(TagError, match="empty string"):
        cat.add_allowed_values("tag1", [""])
    cat.add_allowed_values("tag1", [" "])  # bare space is legal


def test_add_existing_value(cat):
    with pytest.raises(TagError, match="already exists"):
        cat.add_allowed_values("tag1", ["val1"])


def test_disallowed_object_value(cat):
    with pytest.raises(TagError, match="not allowed"):
        cat.tag_object("database", "db1", [("tag1", "novalue")])


def test_duplicate_keys_in_tag_clause(cat):
    with pytest.raises(TagError, match="duplicate tag keys"):
        cat.tag_object("database", "db3",
                       [("tag1", "val1"), ("tag1", "val1")])


def test_empty_tag_clause(cat):
    with pytest.raises(TagError, match="empty TAG"):
        cat.tag_object("database", "db2", [])


def test_unknown_tag(cat):
    with pytest.raises(TagError, match="does not exist"):
        cat.tag_object("table", "t", [("nope", "v")])


def test_drop_referenced_tag(cat):
    cat.tag_object("table", "t", [("tag1", "val1")])
    with pytest.raises(TagError, match="referenced"):
        cat.drop_tag("tag1")
    cat.untag_object("table", "t", "tag1")
    cat.drop_tag("tag1")
