import argparse
import io

import pytest

from thrifty_tpu.config import settings as st


def test_parse_kv_config():
    cfg = io.StringIO(
        "# a comment\n"
        "sample_rate: 2.4M  # trailing comment\n"
        "\n"
        "block_size: 16384\n"
        "carrier_window:     7 - 110\n"
    )
    parsed = st.parse_kv_config(cfg)
    assert parsed == {
        "sample_rate": "2.4M",
        "block_size": "16384",
        "carrier_window": "7 - 110",
    }


def test_parse_kv_config_syntax_error():
    with pytest.raises(st.ConfigSyntaxError):
        st.parse_kv_config(io.StringIO("no delimiter here\n"))


def test_defaults():
    values = st.load_settings()
    assert values["sample_rate"] == pytest.approx(2.4e6)
    assert values["block_size"] == 16384
    assert values["block_history"] == 4920
    assert values["carrier_threshold"] == (0.0, 15.0, 0.0)
    assert values["rxid"] == -1


def test_precedence_config_over_default():
    cfg = io.StringIO("block_size: 8192\n")
    values = st.load_settings(config_file=cfg)
    assert values["block_size"] == 8192


def test_precedence_args_over_config():
    cfg = io.StringIO("block_size: 8192\nrxid: 3\n")
    values = st.load_settings(args={"block_size": "4096"}, config_file=cfg)
    assert values["block_size"] == 4096
    assert values["rxid"] == 3


def test_unknown_key_rejected():
    with pytest.raises(st.UnknownSettingError):
        st.load_settings(args={"bogus": "1"})
    with pytest.raises(st.UnknownSettingError):
        st.load_settings(config_file=io.StringIO("bogus: 1\n"))


def test_load_args_end_to_end(tmp_path):
    cfg = tmp_path / "detector.cfg"
    cfg.write_text("block_size: 8192\nrxid: 5\n")
    parser = argparse.ArgumentParser()
    parser.add_argument("input", type=str)
    config, extra = st.load_args(
        parser,
        ["block_size", "rxid", "sample_rate"],
        argv=["in.card", "-c", str(cfg), "--rxid", "7"],
    )
    assert config.block_size == 8192
    assert config.rxid == 7  # CLI wins
    assert config.sample_rate == pytest.approx(2.4e6)  # default
    assert extra.input == "in.card"


def test_explicit_missing_config_is_usage_error(capsys):
    """-c with a nonexistent path must exit cleanly (parser.error),
    not dump a FileNotFoundError traceback."""
    import argparse

    from thrifty_tpu.config import settings as st

    parser = argparse.ArgumentParser()
    with pytest.raises(SystemExit) as exc:
        st.load_args(parser, ["block_size"],
                     argv=["-c", "/nonexistent/detecto.cfg"])
    assert exc.value.code == 2
    assert "cannot read config file" in capsys.readouterr().err
