"""File-source tests (sources/files.py): NDJSON / CSV / text /
syslog, each with the malformed-input error-lane contract (data
errors NEVER raise from a stage)."""

from __future__ import annotations

import pytest


class TestNdjson:
    def test_good_and_bad_lines(self, ray_session, tmp_path):
        from vrl_ray.sources.files import read_ndjson

        f = tmp_path / "e.ndjson"
        f.write_text('{"a": 1, "b": "x"}\n'
                     'not json at all\n'
                     '{"a": 2, "c": {"k": 1}}\n'
                     '[1, 2]\n')
        rows = read_ndjson(str(f)).take_all()
        assert len(rows) == 4
        good = [r for r in rows if r["_parse_err"] is None]
        bad = [r for r in rows if r["_parse_err"] is not None]
        assert len(good) == 2 and len(bad) == 2
        assert {r["a"] for r in good} == {1, 2}
        # nested containers stay JSON-encoded (stable schema)
        assert any(r.get("c") == '{"k":1}' for r in good)
        assert any(r["_raw"] == "not json at all" for r in bad)

    def test_empty_lines_are_errors_not_crashes(self, ray_session, tmp_path):
        from vrl_ray.sources.files import read_ndjson

        f = tmp_path / "e.ndjson"
        f.write_text('{"a": 1}\n\n{"a": 3}\n')
        rows = read_ndjson(str(f)).take_all()
        assert sum(r["_parse_err"] is not None for r in rows) <= 1
        assert sum(r.get("a") is not None for r in rows) == 2


class TestTextAndCsv:
    def test_read_text_message_column(self, ray_session, tmp_path):
        from vrl_ray.sources.files import read_text

        f = tmp_path / "log.txt"
        f.write_text("line one\nline two\n")
        rows = read_text(str(f)).take_all()
        assert [r["message"] for r in rows] == ["line one", "line two"]

    def test_read_csv(self, ray_session, tmp_path):
        from vrl_ray.sources.files import read_csv

        f = tmp_path / "d.csv"
        f.write_text("a,b\n1,x\n2,y\n")
        rows = read_csv(str(f)).take_all()
        assert rows == [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]


class TestSyslog:
    def test_parse_and_error_lane(self, ray_session, tmp_path):
        from vrl_ray.sources.files import read_syslog

        f = tmp_path / "sys.log"
        f.write_text(
            "<34>1 2020-03-13T20:45:38.119Z host app 2426 ID931 - hello\n"
            "complete garbage line\n")
        rows = sorted(read_syslog(str(f)).take_all(),
                      key=lambda r: r["_raw"])
        parsed = [r for r in rows if r["message"] == "hello"]
        assert parsed and parsed[0]["hostname"] == "host"
        assert parsed[0]["appname"] == "app"
        # the garbage line must be present, not raised
        assert len(rows) == 2
