"""gpcopy.sql error corpus pinned loud against sources/gpcopy.py
(texts from expected/gpcopy.out)."""

from __future__ import annotations

import pytest

from cloudberry_spark.sources.gpcopy import _pg_array, copy_text_rows


def test_missing_data_for_column():
    # gpcopy.out:230 — the backslash-before-newline continuation does
    # NOT join lines; the short line errors on the next column
    with pytest.raises(ValueError,
                       match='missing data for column "b"'):
        copy_text_rows("an embedded linefeed \\\nand another one\\",
                       ["a", "b", "c"], ["a", "b", "c"],
                       delimiter="|")


def test_extra_data_after_last_column():
    # gpcopy.out:178
    with pytest.raises(ValueError, match="extra data after last"):
        copy_text_rows("a\tb\tc\td", ["a", "b", "c"],
                       ["a", "b", "c"])


def test_octal_and_c_escapes():
    [r] = copy_text_rows("x\\100y\\tz\\n\\N", ["a"], ["a"])
    # \100 -> '@', \t -> TAB, \n -> LF, a non-special \N -> 'N'
    # (the field is NOT null: the marker compares against RAW bytes
    # and the raw field here is longer than '\N')
    assert r["a"] == "x@y\tz\nN"
    [r] = copy_text_rows("\\N", ["a"], ["a"])
    assert r["a"] is None  # the RAW field equals the null marker


def test_custom_escape_char():
    [r] = copy_text_rows("at #100 and #|pipe|2", ["a", "b"],
                         ["a", "b"], delimiter="|", escape="#")
    assert r["a"] == "at @ and |pipe"
    assert r["b"] == "2"


def test_escape_off_keeps_backslashes():
    [r] = copy_text_rows("c:\\\\file\\data|1", ["a", "b"],
                         ["a", "b"], delimiter="|", escape=None)
    assert r["a"] == "c:\\\\file\\data"


def test_pg_array_nested():
    assert _pg_array("{1,2,3}") == ["1", "2", "3"]
    assert _pg_array("{{a,b},{c d,e}}") == [["a", "b"], ["c d", "e"]]
