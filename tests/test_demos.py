"""The runnable demo scripts are part of the product surface (README
points users at them) — pin that both run end to end at sf0.001 so
they cannot rot as the query registry evolves."""

import importlib.util
import sys


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _run_demo(path, name, monkeypatch):
    # the demos read sys.argv[1] as sf_dir; under pytest argv is the
    # test node id — pin the default explicitly
    monkeypatch.setattr(sys, "argv", [path, "/root/testdata/sf0.001"])
    mod = _load(path, name)
    return mod.main()


def test_corpus_demo_runs(spark, capsys, monkeypatch):
    assert _run_demo(
        "scripts/demo_corpus_pipeline.py", "demo_corpus", monkeypatch
    ) == 0
    out = capsys.readouterr().out
    assert "demo: all stages ran" in out


def test_streaming_demo_runs(spark, capsys, monkeypatch):
    assert _run_demo(
        "scripts/demo_streaming.py", "demo_streaming", monkeypatch
    ) == 0
    out = capsys.readouterr().out
    assert "demo: all streaming stages ran" in out
