"""Config parser contract tests (reference nnet/config.py:40-63 semantics)."""

from lstm_ctc_tpu.config import format_config, parse_config


def test_parse_config_typed(tmp_path):
    path = tmp_path / "nnet.config"
    path.write_text(
        "# comment line\n"
        "nnet_type = blstm\n"
        "input_dim = 120\n"
        "dropout_rate = 0.9\n"
        "use_peepholes = True\n"
        "use_bn = false\n"
        "num_projects 320\n"          # 'key value' without '=' also parses
        "moe_temp = 10.0 #inline\n"
    )
    config = parse_config(str(path))
    assert config["nnet_type"] == "blstm"
    assert config["input_dim"] == 120 and isinstance(config["input_dim"], int)
    assert config["dropout_rate"] == 0.9
    assert config["use_peepholes"] is True
    assert config["use_bn"] is False
    assert config["num_projects"] == 320
    assert config["moe_temp"] == 10.0


def test_format_roundtrip(tmp_path):
    config = {"a": 1, "b": 2.5, "c": True, "d": "text"}
    path = tmp_path / "c.config"
    path.write_text(format_config(config))
    assert parse_config(str(path)) == config
