"""bench.py smoke: the driver-critical entry must run end to end (tiny sizes
on CPU) and emit exactly one valid JSON line."""
import importlib
import json
import sys


def test_bench_main_smoke(monkeypatch, tmp_path, capsys):
    monkeypatch.setenv("TARL_BENCH_GRID", "3")
    monkeypatch.setenv("TARL_BENCH_AGENTS", "50")
    monkeypatch.setenv("TARL_BENCH_SECONDS", "128")
    monkeypatch.setenv("TARL_BENCH_CHUNK", "64")
    monkeypatch.setenv("TARL_BENCH_DIR", str(tmp_path))
    sys.modules.pop("bench", None)
    bench = importlib.import_module("bench")
    bench.main()
    out = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert len(out) == 1
    result = json.loads(out[0])
    assert result["metric"] == "agent_steps_per_sec"
    assert result["value"] > 0
    assert result["unit"] == "agent-steps/s"
    assert result["vs_baseline"] == round(result["value"] / 1e6, 3)
