"""Config round-trip and validation tests (reference: config/Config.m)."""

import json

import pytest

from pdmpc_tpu.config import (
    Config,
    ManualControlConfig,
    MpaType,
    PriorityStrategies,
    ScenarioType,
)


def test_defaults_match_reference():
    cfg = Config()
    # Reference defaults, Config.m:6-50
    assert cfg.amount == 20
    assert cfg.dt_seconds == 0.2
    assert cfg.Hp == 6
    assert cfg.max_num_CLs == 99
    assert cfg.is_prioritized
    assert cfg.recursive_feasibility
    assert cfg.offset == 0.01
    assert cfg.tick_per_step == 20
    assert cfg.k_end == 100


def test_dependent_properties():
    cfg = Config(T_end=4.0, dt_seconds=0.2)
    assert cfg.k_end == 20
    assert Config(scenario_type=ScenarioType.circle).are_any_obstacles_non_convex is False
    assert Config(is_prioritized=False).are_any_obstacles_non_convex is False
    assert Config(scenario_type=ScenarioType.commonroad).are_any_obstacles_non_convex


def test_json_roundtrip(tmp_path):
    cfg = Config(
        amount=3,
        T_end=4.0,
        scenario_type=ScenarioType.circle,
        priority=PriorityStrategies.coloring_priority,
        mpa_type=MpaType.triple_speed,
        path_ids=(18, 19, 20),
    )
    p = tmp_path / "Config.json"
    cfg.save_to_file(str(p))
    loaded = Config.load_from_file(str(p))
    assert loaded.isequal(cfg)
    assert loaded.priority == PriorityStrategies.coloring_priority
    # dependent props present in file (like reference jsonencode)
    d = json.loads(p.read_text())
    assert d["k_end"] == 20


def test_validate_defaults_path_ids():
    cfg = Config(amount=3).validate()
    assert cfg.path_ids == (18, 19, 20)
    cfg = Config(amount=2).validate()
    assert cfg.path_ids == (18, 20)


def test_validate_randomized_path_ids_unique():
    cfg = Config(amount=10).validate()
    assert len(cfg.path_ids) == 10
    assert len(set(cfg.path_ids)) == 10
    # enforce_crossing_intersection: only ids >= 9
    assert min(cfg.path_ids) >= 9


def test_validate_caps_max_num_cls():
    cfg = Config(amount=5, scenario_type=ScenarioType.circle).validate()
    assert cfg.max_num_CLs == 5


def test_validate_rejects_mismatched_path_ids():
    with pytest.raises(AssertionError):
        Config(amount=3, path_ids=(18,)).validate()


def test_manual_control_config_roundtrip():
    mcc = ManualControlConfig(is_active=True, amount=2, hdv_ids=(1, 2))
    cfg = Config(amount=3, path_ids=(1, 2, 3), manual_control_config=mcc)
    d = cfg.to_json_dict()
    loaded = Config.from_json_dict(d)
    assert loaded.manual_control_config == mcc


def test_isequal_ignores_presentation_fields():
    a = Config(amount=3, path_ids=(1, 2, 3))
    b = Config(amount=3, path_ids=(1, 2, 3), time_per_tick=0.02,
               is_use_dynamic_programming=False)
    assert a.isequal(b)
    c = Config(amount=4)
    assert not a.isequal(c)
