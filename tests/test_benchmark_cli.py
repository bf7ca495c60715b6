"""Benchmark harness smoke tests: every system/circuit combination must run
end-to-end at tiny k through the CLI entry point (reference
benchmark/benches/proof_system.rs is exercised the same way)."""

import os

import pytest

from plonkish_tpu import benchmark


@pytest.fixture(autouse=True)
def _bench_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)


def test_cli_hyperplonk_vanilla():
    benchmark.main(
        ["--system", "hyperplonk", "--circuit", "vanilla_plonk",
         "--k", "5..6", "--samples", "1"]
    )
    assert os.path.exists("target/bench/hyperplonk")


def test_cli_univariate_plonk():
    benchmark.main(
        ["--system", "univariate_plonk", "--circuit", "vanilla_plonk",
         "--k", "5..6", "--samples", "1"]
    )
    assert os.path.exists("target/bench/univariate_plonk")


def test_cli_sangria_fold():
    benchmark.main(
        ["--system", "sangria", "--circuit", "vanilla_plonk",
         "--k", "5..6", "--samples", "2"]
    )
    assert os.path.exists("target/bench/sangria")


def test_cli_pcs_microbench():
    benchmark.main(
        ["--system", "pcs", "--pcs", "kzg", "--k", "5..6",
         "--samples", "1"]
    )
    assert os.path.exists("target/bench/pcs_kzg")
    with open("target/bench/pcs_kzg") as f:
        rows = [l for l in f if not l.startswith("#")]
    # `k, commit_ms, open_ms`
    assert rows and len(rows[0].split(",")) == 3


def test_cli_plotter(tmp_path):
    from plonkish_tpu import plotter

    os.makedirs("target/bench", exist_ok=True)
    with open("target/bench/sys_a", "w") as f:
        f.write("5, 100.0\n6, 250.0\n")
    with open("target/bench/sys_b", "w") as f:
        f.write("5, 80.0\n6, 190.0\n")
    plotter.main(["--dir", "target/bench"])
    assert os.path.exists("target/bench/plot.svg")
