"""Capture wrapper flag translation + .tpl template loading in detect."""

import numpy as np

from thrifty_tpu.config import settings as st
from thrifty_tpu.pipeline import capture


def test_build_args_translation():
    values = st.load_settings(config_file=iter([
        "sample_rate: 2.4M",
        "tuner_freq: 433.83M",
        "tuner_gain: 29",
        "block_size: 16384",
        "block_history: 4920",
        "carrier_window: 7 - 110",
        "carrier_threshold: 100c+2s",
        "capture_skip: 20000",
    ]))
    ns = st.Namespace(values)
    args = capture.build_args(ns, output="rx.card")
    joined = " ".join(args)
    assert "-i rtlsdr" in joined
    assert "-s 2400000.0" in joined
    assert "-f 433830000" in joined
    assert "-b 16384" in joined
    assert "-h 4920" in joined
    assert "-w 7-110" in joined
    assert "-t 100.0c2.0s" in joined
    assert "-k 20000" in joined
    assert "-o rx.card" in joined


def test_capture_cli_missing_binary(tmp_path):
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    code = ("import sys; from thrifty_tpu.cli import main; "
            "sys.exit(main(['capture', '--capture-cmd', "
            "'definitely-not-a-binary-xyz', '-o', 'out.card']))")
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         cwd=str(tmp_path), capture_output=True,
                         text=True, timeout=120)
    assert res.returncode == 1
    assert "not found" in res.stderr


def test_detect_loads_tpl_template(tmp_path):
    from thrifty_tpu.dsp import template as template_mod
    from thrifty_tpu.io import tpl

    template = template_mod.generate(5, 0, 2.0)
    path = str(tmp_path / "t.tpl")
    tpl.save_tpl(path, template)
    loaded = tpl.load_template(path)
    np.testing.assert_allclose(loaded, template, atol=1e-6)
    npy = str(tmp_path / "t.npy")
    np.save(npy, template)
    np.testing.assert_allclose(tpl.load_template(npy), template)
