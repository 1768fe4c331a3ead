"""Config wizard tests (reference: ui/config_gui.m + ConfigGui.mlapp)."""

import json

from pdmpc_tpu.config import Config, PriorityStrategies, ScenarioType
from pdmpc_tpu.config_gui import _PREVIOUS_PATH, config_gui


class TestConfigGui:
    def test_defaults_non_interactive(self, monkeypatch, tmp_path):
        monkeypatch.setattr("pdmpc_tpu.config_gui._PREVIOUS_PATH",
                            str(tmp_path / "prev.json"))
        cfg = config_gui(interactive=False)
        assert cfg == Config().validate()

    def test_scripted_selection_and_persistence(self, monkeypatch, tmp_path):
        prev = str(tmp_path / "prev.json")
        monkeypatch.setattr("pdmpc_tpu.config_gui._PREVIOUS_PATH", prev)
        answers = iter(
            # 10 enum menus: pick option 2 for scenario (circle),
            # defaults elsewhere; priority is the 5th enum field
            ["2", "", "", "", "4", "", "", "", "", ""]
            # is_prioritized
            + [""]
            # amount, T_end, Hp, max_num_CLs, beam_width, seed
            + ["4", "2.0", "", "", "128", ""]
        )
        cfg = config_gui(input_fn=lambda _: next(answers))
        assert cfg.scenario_type == ScenarioType.circle
        assert cfg.priority == list(PriorityStrategies)[3]
        assert cfg.amount == 4 and cfg.T_end == 2.0 and cfg.beam_width == 128
        # previous selection persisted (config_gui.m:60-66) and reloaded as
        # the new defaults
        saved = json.load(open(prev))
        assert saved["amount"] == 4
        cfg2 = config_gui(interactive=False)
        assert cfg2.scenario_type == ScenarioType.circle
        assert cfg2.amount == 4
