"""CLI orchestration tests via monkeypatched Runner methods — asserts
setup/train/eval sequencing without touching heavy deps (the reference's
main_cli_test.py:4-38 pattern)."""
import pytest

from tarl_tpu import runner as runner_mod


@pytest.fixture
def recorded(monkeypatch):
    calls = []
    monkeypatch.setattr(runner_mod.Runner, "setup",
                        lambda self: calls.append("setup"))
    monkeypatch.setattr(runner_mod.Runner, "train",
                        lambda self: calls.append("train"))
    monkeypatch.setattr(runner_mod.Runner, "eval",
                        lambda self: calls.append("eval"))
    return calls


def test_eval_mode_sequencing(recorded):
    runner_mod.main(["--algo", "dijkstra", "--mode", "eval"])
    assert recorded == ["setup", "eval"]


def test_train_mode_sequencing(recorded):
    runner_mod.main(["--algo", "mpnn+ppo", "--mode", "train"])
    assert recorded == ["setup", "train", "eval"]


def test_args_forwarded(monkeypatch):
    captured = {}

    def fake_setup(self):
        captured.update(vars(self.args))

    monkeypatch.setattr(runner_mod.Runner, "setup", fake_setup)
    monkeypatch.setattr(runner_mod.Runner, "eval", lambda self: None)
    runner_mod.main([
        "--algo", "random", "--scenario", "Braess", "--timestep_size", "5",
        "--start-end-time", "21600", "28800", "--seed", "7",
        "--exec", "eager",
    ])
    assert captured["algo"] == "random"
    assert captured["scenario"] == "Braess"
    assert captured["timestep_size"] == 5
    assert captured["start_end_time"] == (21600, 28800)
    assert captured["seed"] == 7
    assert captured["exec_mode"] == "eager"


def test_unknown_algo_rejected():
    with pytest.raises(SystemExit):
        runner_mod.main(["--algo", "nonsense"])
