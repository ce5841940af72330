import textwrap

from com_tpu.utils.config import CfgNode, cfg_from_yaml_file, cfg_from_list


def test_base_config_merge(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(
        textwrap.dedent(
            """
            DATA_CONFIG:
              DATASET: WaymoDataset
              POINT_CLOUD_RANGE: [-10, -10, -2, 10, 10, 4]
              NESTED: {A: 1, B: 2}
            """
        )
    )
    child = tmp_path / "child.yaml"
    child.write_text(
        textwrap.dedent(
            f"""
            _BASE_CONFIG_: {base}
            CLASS_NAMES: [Vehicle]
            DATA_CONFIG:
              NESTED: {{B: 3}}
            """
        )
    )
    cfg = cfg_from_yaml_file(str(child))
    assert cfg.CLASS_NAMES == ["Vehicle"]
    assert cfg.DATA_CONFIG.DATASET == "WaymoDataset"
    assert cfg.DATA_CONFIG.NESTED.A == 1
    assert cfg.DATA_CONFIG.NESTED.B == 3
    assert cfg.TAG == "child"


def test_cfg_from_list_overrides():
    cfg = CfgNode({"OPTIMIZATION": {"LR": 0.003, "NUM_EPOCHS": 30}, "TAG": "x"})
    cfg_from_list(["OPTIMIZATION.LR", "0.001", "OPTIMIZATION.NUM_EPOCHS", "5"], cfg)
    assert cfg.OPTIMIZATION.LR == 0.001
    assert cfg.OPTIMIZATION.NUM_EPOCHS == 5


def test_clone_is_deep():
    cfg = CfgNode({"A": {"B": 1}})
    c2 = cfg.clone()
    c2.A.B = 7
    assert cfg.A.B == 1
