"""Front-end smoke tests: i18n tables, webui config generation, CLI parsers."""
import os

import gui_locale
import webui


def test_i18n_inheritance_chain():
    en = gui_locale.I18nAuto("en_US")
    zh = gui_locale.I18nAuto("zh_CN")
    ja = gui_locale.I18nAuto("ja_JP")
    assert en("Speaker ID") == "Speaker ID"
    assert zh("Speaker ID") == "说话人ID"
    assert ja("Speaker ID") == "話者ID"
    # unknown keys fall back to the key itself
    assert zh("nonexistent-key") == "nonexistent-key"
    # unknown locale falls back to en_US
    assert gui_locale.I18nAuto("fr_FR").language == "en_US"


def test_webui_config_generation(tmp_path):
    out = str(tmp_path / "opt.yaml")
    path = webui.generate_config(
        "configs/combsub.yaml",
        {"env": {"expdir": "exp/webui-test"}, "train": {"batch_size": 8}},
        out_path=out,
    )
    assert os.path.isfile(path)
    from ddsp_svc_tpu.utils.config import load_config

    cfg = load_config(path)
    assert cfg.env.expdir == "exp/webui-test"
    assert cfg.train.batch_size == 8
    assert cfg.model.type == "CombSubFast"  # template fields preserved


def test_main_cli_parser():
    import main as main_cli

    cmd = main_cli.parse_args(
        ["-m", "m.ckpt", "-i", "a.wav", "-o", "b.wav", "-k", "12",
         "-id", "2", "-pe", "dio", "-eak", "auto"]
    )
    assert cmd.key == "12" and cmd.spk_id == "2"
    assert cmd.pitch_extractor == "dio"
    assert cmd.enhancer_adaptive_key == "auto"
