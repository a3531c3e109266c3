"""Object tags — the reference's CREATE TAG / TAG (...) feature.

Reference: src/test/regress/sql/tag.sql (635 lines; catalogs pg_tag
and pg_tag_description): governance labels with optional
ALLOWED_VALUES lists, attachable to objects at CREATE time
(``CREATE DATABASE db TAG (tag1 = 'val1', ...)``) or via ALTER.

Rules enforced exactly as the file's error blocks pin them:
* duplicate tag names error (IF NOT EXISTS skips);
* an ALLOWED_VALUES list caps at 300 entries, rejects duplicate
  entries and the empty string (a bare space is a legal value), and
  each value caps at 256 chars (the tag6 overlong error);
* object tagging validates values against the tag's list when one is
  set ('novalue' errors), rejects duplicate tag keys in one TAG()
  clause, and treats '' as "tag attached with no value" (legal even
  under a value list — tag.sql:270,275);
* ALTER TAG RENAME / ADD ALLOWED_VALUES (same dup/empty/cap rules) /
  UNSET ALLOWED_VALUES.

The catalogs surface as DataFrames (pg_tag, pg_tag_description) so
tag governance is queryable/joinable like any relation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_MAX_VALUES = 300
_MAX_VALUE_LEN = 256


class TagError(ValueError):
    pass


def _check_values(values: list[str], existing: list[str] = ()) -> None:
    if len(set(values)) != len(values):
        raise TagError("duplicate ALLOWED_VALUES entries")
    for v in values:
        if v == "":
            raise TagError("empty string is not a valid allowed value")
        if len(v) > _MAX_VALUE_LEN:
            raise TagError("allowed value longer than 256 characters")
        if v in existing:
            raise TagError(f"allowed value '{v}' already exists")
    if len(values) + len(existing) > _MAX_VALUES:
        raise TagError("more than 300 allowed values")


@dataclass
class Tag:
    name: str
    allowed_values: list[str] | None = None


@dataclass
class TagCatalog:
    spark: SparkSession
    tags: dict[str, Tag] = field(default_factory=dict)
    #: (objtype, objname) -> {tagname: value}
    descriptions: dict[tuple[str, str], dict[str, str]] = field(
        default_factory=dict
    )

    # -- tag DDL -----------------------------------------------------------

    def create_tag(self, name: str,
                   allowed_values: list[str] | None = None,
                   if_not_exists: bool = False) -> None:
        if name in self.tags:
            if if_not_exists:
                return
            raise TagError(f"tag '{name}' already exists")
        if allowed_values is not None:
            _check_values(allowed_values)
        self.tags[name] = Tag(name, list(allowed_values)
                              if allowed_values else allowed_values)

    def drop_tag(self, name: str, if_exists: bool = False) -> None:
        if name not in self.tags:
            if if_exists:
                return
            raise TagError(f"tag '{name}' does not exist")
        for desc in self.descriptions.values():
            if name in desc:
                raise TagError(
                    f"tag '{name}' is referenced by tagged objects"
                )
        del self.tags[name]

    def rename_tag(self, name: str, new: str) -> None:
        if name not in self.tags:
            raise TagError(f"tag '{name}' does not exist")
        if new in self.tags:
            raise TagError(f"tag '{new}' already exists")
        tag = self.tags.pop(name)
        tag.name = new
        self.tags[new] = tag
        for desc in self.descriptions.values():
            if name in desc:
                desc[new] = desc.pop(name)

    def add_allowed_values(self, name: str, values: list[str]) -> None:
        tag = self.tags.get(name)
        if tag is None:
            raise TagError(f"tag '{name}' does not exist")
        existing = tag.allowed_values or []
        _check_values(values, existing)
        tag.allowed_values = existing + list(values)

    def unset_allowed_values(self, name: str) -> None:
        tag = self.tags.get(name)
        if tag is None:
            raise TagError(f"tag '{name}' does not exist")
        tag.allowed_values = None

    # -- object tagging ------------------------------------------------

    def tag_object(self, objtype: str, objname: str,
                   pairs: list[tuple[str, str]]) -> None:
        """CREATE/ALTER <objtype> <objname> TAG (k = 'v', ...)."""
        if not pairs:
            raise TagError("empty TAG () clause")
        keys = [k for k, _ in pairs]
        if len(set(keys)) != len(keys):
            raise TagError("duplicate tag keys in one TAG clause")
        for k, v in pairs:
            tag = self.tags.get(k)
            if tag is None:
                raise TagError(f"tag '{k}' does not exist")
            # '' means "attached with no value" and is always legal
            # (tag.sql:270,275); non-empty values validate when the
            # tag carries an ALLOWED_VALUES list
            if v != "" and tag.allowed_values is not None \
                    and v not in tag.allowed_values:
                raise TagError(
                    f"value '{v}' is not allowed for tag '{k}'"
                )
        self.descriptions.setdefault((objtype, objname), {}).update(
            dict(pairs)
        )

    def untag_object(self, objtype: str, objname: str, key: str) -> None:
        desc = self.descriptions.get((objtype, objname), {})
        if key not in desc:
            raise TagError(
                f"{objtype} '{objname}' carries no tag '{key}'"
            )
        del desc[key]

    # -- catalog relations ----------------------------------------------

    def pg_tag(self) -> DataFrame:
        rows = [
            (t.name,
             ",".join(t.allowed_values) if t.allowed_values else None)
            for t in self.tags.values()
        ]
        return self.spark.createDataFrame(
            rows or [(None, None)],
            schema="tagname STRING, allowed_values STRING",
        ).where("tagname IS NOT NULL")

    def pg_tag_description(self) -> DataFrame:
        rows = [
            (ot, on, k, v)
            for (ot, on), desc in self.descriptions.items()
            for k, v in desc.items()
        ]
        return self.spark.createDataFrame(
            rows or [(None, None, None, None)],
            schema="objtype STRING, objname STRING, tagname STRING, "
                   "tagvalue STRING",
        ).where("objtype IS NOT NULL")
