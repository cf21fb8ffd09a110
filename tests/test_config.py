import json

from probtalk_tpu.config import Config, load_config, dict_merge


def test_attribute_and_mapping_access(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"Model": {"code_num": 128, "groups": 4}, "lr": 1e-4}))
    cfg = load_config(str(p))
    assert cfg.Model.code_num == 128
    assert cfg["Model"]["groups"] == 4
    assert cfg.lr == 1e-4
    assert cfg.get("missing", "d") == "d"


def test_base_inheritance(tmp_path):
    (tmp_path / "base.json").write_text(
        json.dumps({"Model": {"code_num": 128, "groups": 4}, "Train": {"epochs": 100}})
    )
    (tmp_path / "child.json").write_text(
        json.dumps({"_BASE_": "base.json", "Model": {"groups": 8}})
    )
    cfg = load_config(str(tmp_path / "child.json"))
    assert cfg.Model.code_num == 128   # inherited
    assert cfg.Model.groups == 8       # overridden
    assert cfg.Train.epochs == 100


def test_immutable_and_replace():
    cfg = Config({"a": 1, "b": {"c": 2}})
    try:
        cfg.a = 5
        assert False, "should be immutable"
    except AttributeError:
        pass
    cfg2 = cfg.replace(b={"c": 3})
    assert cfg2.b.c == 3 and cfg.b.c == 2


def test_dict_merge_nested():
    out = dict_merge({"a": {"x": 1, "y": 2}}, {"a": {"y": 3}, "b": 4})
    assert out == {"a": {"x": 1, "y": 3}, "b": 4}


def test_make_splits_demo_layout():
    import os
    import pytest as _pytest

    if not os.path.isdir("/root/reference/demo_audio"):
        _pytest.skip("fixtures missing")
    from probtalk_tpu.cli.make_splits import make_splits

    splits = make_splits("/root/reference/demo_audio",
                         ["oliver", "chemistry", "seth", "conan"], seed=0)
    total = sum(len(v) for v in splits.values())
    assert total >= 4
    # entries are speaker/clip strings pointing at existing pkls
    for arr in splits.values():
        for e in arr:
            sp, clip = str(e).split("/")
            assert os.path.exists(
                f"/root/reference/demo_audio/{sp}/{clip}/{clip}.pkl")
    # disjoint
    all_set = [str(x) for v in splits.values() for x in v]
    assert len(all_set) == len(set(all_set))


class TestShippedConfigs:
    """Every shipped config loads and (when upstream has a net for it)
    its Model.model_name resolves in the registry — the full
    config-surface of /root/reference/config/*.json."""

    def test_all_configs_load_and_build(self):
        import glob
        import os

        from probtalk_tpu.models import builders  # noqa: F401 (registers)
        from probtalk_tpu.models.registry import MODEL_REGISTRY

        root = os.path.join(os.path.dirname(__file__), "..", "configs")
        paths = sorted(glob.glob(os.path.join(root, "*.json")))
        assert len(paths) >= 10
        for p in paths:
            cfg = load_config(p)
            name = cfg.Model.get("model_name") if "Model" in cfg else None
            if name is None or name == "StyleGestures":
                # base.json has no Model; StyleGestures has no net upstream
                continue
            assert name in MODEL_REGISTRY, (p, name)
            from probtalk_tpu.models.registry import build_model

            module = build_model(name, cfg)   # module construction is lazy
            assert module is not None
