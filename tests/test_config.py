"""Config parsing parity tests against the reference's quirky semantics
(util/config.py)."""

import pytest

from qrec_tpu.config import ModelConf, OptionConf
from qrec_tpu.errors import ConfigError


def test_option_conf_main_switch():
    assert OptionConf("on -topN 10").isMainOn()
    assert not OptionConf("off -dir ./results/").isMainOn()
    assert not OptionConf("-cv 5").isMainOn()


def test_option_conf_basic_flags():
    opt = OptionConf("on -topN 10,20 -dir ./results/")
    assert opt["-topN"] == "10,20"
    assert opt["-dir"] == "./results/"
    assert opt.contains("-topN")
    assert not opt.contains("-missing")


def test_option_conf_numeric_minus_is_value():
    # reference quirk: '-1' has a digit tail so it is a VALUE, not a flag
    # (util/config.py:39)
    opt = OptionConf("-columns 0 1 2")
    assert opt["-columns"] == "0 1 2"
    # but '-0.5' is (bizarrely) a flag in the reference since '.':
    opt2 = OptionConf("-eps -0.5")
    assert opt2.contains("-0.5")
    assert opt2["-eps"] == ""


def test_option_conf_multi_token_values():
    opt = OptionConf("on -cv 5 -b 1 -p")
    assert opt["-cv"] == "5"
    assert opt["-b"] == "1"
    assert opt["-p"] == ""


def test_option_conf_trailing_flag_empty_value():
    opt = OptionConf("-tf")
    assert opt.contains("-tf")
    assert opt["-tf"] == ""


def test_option_conf_typed():
    opt = OptionConf("on -topN 10,20 -init 0.01")
    assert opt.get_ints("-topN") == [10, 20]
    assert opt.get_float("-init") == pytest.approx(0.01)
    assert opt.get_int("-absent", 3) == 3


def test_model_conf_dict_and_missing_key():
    conf = ModelConf({"model.name": "BPR", "num.factors": "10"})
    assert conf["model.name"] == "BPR"
    assert conf.get_int("num.factors") == 10
    with pytest.raises(ConfigError):
        conf["nope"]


def test_model_conf_file(tmp_path):
    p = tmp_path / "test.conf"
    p.write_text(
        "ratings=./data.txt\nmodel.name=LightGCN\n\nLightGCN= -n_layer 2\n"
    )
    conf = ModelConf(str(p))
    assert conf["ratings"] == "./data.txt"
    opts = conf.model_options()
    assert opts is not None and opts["-n_layer"] == "2"


def test_model_conf_missing_file():
    with pytest.raises(ConfigError):
        ModelConf("/nonexistent/path.conf")


def test_all_shipped_confs_parse():
    """Every bundled config/*.conf must parse and name a registered model —
    guards against format drift (ModelConf has no comment syntax, matching
    the reference parser util/config.py:8-13)."""
    import glob
    import os

    from qrec_tpu.models import available_models, get_model

    root = os.path.join(os.path.dirname(__file__), "..", "config")
    paths = sorted(glob.glob(os.path.join(root, "*.conf")))
    # every registered model name ships exactly one conf under its own name
    # (the registry includes the "SVD++" display alias, which ships SVD++.conf)
    shipped = {os.path.splitext(os.path.basename(p))[0] for p in paths}
    assert shipped == set(available_models()), (
        sorted(set(available_models()) - shipped),
        sorted(shipped - set(available_models())),
    )
    for p in paths:
        conf = ModelConf(p)
        get_model(conf["model.name"])
        assert conf.contains("evaluation.setup"), p
