"""End-to-end CLI smoke tests (tiny synthetic data, CPU mesh).

Drives the reference-mirroring entry points exactly as a user would
(SURVEY.md §1 CLI row): selftraining.py (SSG), semitraining.py (SSG++),
--evaluate short-circuit, and --resume_loop continuation.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _common(tmp_path, extra):
    return [
        "--src_dataset", "market1501", "--tgt_dataset", "dukemtmc",
        "--scale", "tiny", "--iteration", "1", "--epochs", "1",
        "--batch_size", "16", "--num_instances", "2",
        "--height", "64", "--width", "32", "--arch", "resnet18",
        "--num_features", "16", "--rho", "0.03", "--min_samples", "2",
        "--k1", "8", "--k2", "3", "--dtype", "float32",
        "--logs_dir", str(tmp_path),
    ] + extra


@pytest.fixture(autouse=True)
def restore_stdout():
    orig = sys.stdout
    yield
    sys.stdout = orig


def test_selftraining_cli_end_to_end(tmp_path):
    import selftraining

    rc = selftraining.main(_common(tmp_path, []))
    assert rc == 0
    assert (tmp_path / "log.txt").exists()
    assert (tmp_path / "checkpoint").exists()


def test_selftraining_cli_evaluate_short_circuit(tmp_path):
    import selftraining

    rc = selftraining.main(_common(tmp_path, ["--evaluate"]))
    assert rc == 0
    assert not (tmp_path / "checkpoint").exists()


def test_selftraining_cli_resume_loop(tmp_path):
    import selftraining

    assert selftraining.main(_common(tmp_path, [])) == 0
    args = _common(tmp_path, ["--resume_loop", str(tmp_path / "checkpoint")])
    assert selftraining.main(args) == 0  # iteration 0 done -> no-op run


def test_semitraining_cli_end_to_end(tmp_path):
    import semitraining

    rc = semitraining.main(_common(tmp_path, ["--ce_weight", "0.5"]))
    assert rc == 0
    assert (tmp_path / "checkpoint").exists()


def test_semitraining_resume_mismatched_heads(tmp_path):
    """SSG++ resuming a SOURCE-pretrained checkpoint: classifier heads sized
    to the source id count must be dropped for the fresh target heads."""
    import pretraining
    import semitraining

    pre_dir = tmp_path / "pre"
    rc = pretraining.main([
        "--dataset", "market1501", "--scale", "tiny", "--epochs", "1",
        "--batch_size", "16", "--num_instances", "2", "--arch", "resnet18",
        "--num_features", "16", "--height", "64", "--width", "32",
        "--dtype", "float32", "--logs_dir", str(pre_dir),
    ])
    assert rc == 0
    rc = semitraining.main(_common(tmp_path, [
        "--ce_weight", "0.5",
        "--resume", str(pre_dir / "source_checkpoint"),
    ]))
    assert rc == 0


def test_selftraining_cli_data_parallel(tmp_path):
    """--data_parallel: sharded extraction + streaming mesh clustering
    (runs on the 8-device CPU mesh in tests)."""
    import selftraining

    rc = selftraining.main(_common(tmp_path, ["--data_parallel"]))
    assert rc == 0
    assert (tmp_path / "checkpoint").exists()
