"""Filesystem-level pins for ALTER TABLE (alter_table.sql slice):
binary-coercible ALTER COLUMN TYPE and SET/DROP DEFAULT are
catalog-only (standing files byte-identical, manifest version
unchanged); non-coercible type changes take exactly one rewrite
commit; VALIDATE CONSTRAINT never writes."""

from __future__ import annotations

import os

import pytest

from cloudberry_spark.operators.alter_table import AlterTable, CheckViolation


def _file_state(root: str) -> dict[str, tuple[int, float]]:
    out = {}
    for d in os.listdir(root):
        p = os.path.join(root, d)
        if not os.path.isdir(p) or d.startswith("_"):
            continue
        for f in os.listdir(p):
            st = os.stat(os.path.join(p, f))
            out[f"{d}/{f}"] = (st.st_size, st.st_mtime)
    return out


@pytest.fixture()
def table(spark, tmp_path):
    t = AlterTable(spark, str(tmp_path / "at"), "c1 float, n int, s string")
    t.insert([{"c1": "1.25", "n": "1", "s": "'a'"},
              {"c1": "2.5", "n": "2", "s": "'b'"}])
    return t


def test_widening_is_catalog_only(table):
    before = _file_state(table.snap.root)
    v0 = table.snap.current_version()
    assert table.alter_type("c1", "double") == "metadata-only"
    assert table.alter_type("n", "bigint") == "metadata-only"
    assert table.snap.current_version() == v0, "no commit for widenings"
    assert _file_state(table.snap.root) == before, "files byte-identical"
    # reads serve the new catalog types over the old files
    assert dict(table.read().dtypes) == {
        "c1": "double", "n": "bigint", "s": "string"}
    assert table.read().count() == 2


def test_set_drop_default_is_catalog_only(table):
    before = _file_state(table.snap.root)
    v0 = table.snap.current_version()
    table.set_default("n", "0")
    table.set_default("n", None)
    assert table.snap.current_version() == v0
    assert _file_state(table.snap.root) == before


def test_rewrite_path_commits_exactly_once(table):
    v0 = table.snap.current_version()
    assert table.alter_type("n", "string") == "rewrite"
    assert table.snap.current_version() == v0 + 1, "one rewrite commit"
    assert table.rewrites == 1
    assert dict(table.read().dtypes)["n"] == "string"


def test_validate_never_writes(table):
    table.add_check("c_pos", "n > 0", not_valid=True)
    before = _file_state(table.snap.root)
    v0 = table.snap.current_version()
    table.validate("c_pos")
    table.validate("c_pos")  # idempotent
    assert table.snap.current_version() == v0
    assert _file_state(table.snap.root) == before


def test_plain_add_check_fails_loud_on_violation(table):
    with pytest.raises(CheckViolation):
        table.add_check("c_big", "n > 100")
    # NOT VALID defers; VALIDATE then fails on the same data
    table.add_check("c_big", "n > 100", not_valid=True)
    with pytest.raises(CheckViolation):
        table.validate("c_big")
