"""doctor CLI: node environment selfcheck."""

import json

from thrifty_tpu.cli import main
from thrifty_tpu.pipeline import doctor


def test_doctor_all_green(capsys):
    assert main(["doctor"]) == 0
    out = capsys.readouterr().out
    for check in ("versions", "devices", "native", "compile-cache",
                  "detector", "pipeline"):
        assert check in out
    assert "FAIL" not in out


def test_doctor_json_contract(capsys):
    assert main(["doctor", "--no-device", "--json"]) == 0
    data = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {d["check"] for d in data} == {
        "versions", "devices", "native", "compile-cache"}
    assert all(d["ok"] for d in data)


def test_doctor_reports_failure(monkeypatch, capsys):
    def broken():
        raise RuntimeError("lib exploded")

    monkeypatch.setattr(doctor, "_native", broken)
    assert doctor._main(["--no-device"]) == 1
    captured = capsys.readouterr()
    assert "FAIL" in captured.out and "lib exploded" in captured.out
    assert "native" in captured.err
