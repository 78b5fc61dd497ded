"""Asset-day rehearsal (VERDICT r1 "next" #4): the EXACT command sequence a
user with the real datasets + a torch source checkpoint will run —

    prepare.py  ->  pretraining.py  ->  selftraining.py --resume ckpt.pth

— exercised end-to-end on a synthetic ON-DISK Market-layout tree, through
DirectoryReID (native C++ loader when built, PIL otherwise) and the
torch-checkpoint import path (models/convert.py). The day real assets
arrive, this run is a data swap, not a debug day.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PIL = pytest.importorskip("PIL.Image")
torch = pytest.importorskip("torch")


def _write_market_raw(root, n_ids, per_split, seed, h=64, w=32):
    """A raw Market-1501-style tree: bounding_box_train/query/
    bounding_box_test with {pid:04d}_c{cam}s1_... naming. Per-identity
    distinct color pattern + noise so clustering has real signal."""
    rng = np.random.default_rng(seed)
    base = rng.integers(30, 226, (n_ids, 3))
    counters = {}
    for split, per_id in per_split.items():
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for pid in range(1, n_ids + 1):
            for k in range(per_id):
                cam = int(rng.integers(1, 7))
                idx = counters.get(pid, 0)
                counters[pid] = idx + 1
                img = np.clip(
                    base[pid - 1][None, None]
                    + rng.normal(0, 18, (h, w, 3)), 0, 255
                ).astype(np.uint8)
                # vertical gradient: gives the part branches structure
                img[: h // 2] = np.clip(img[: h // 2] * 0.8, 0, 255)
                name = f"{pid:04d}_c{cam}s1_{idx:06d}_00.jpg"
                PIL.fromarray(img).save(os.path.join(d, name))


def test_asset_day_command_sequence(tmp_path):
    import prepare as prepare_cli
    import pretraining
    import selftraining

    data = tmp_path / "data"

    # --- 1) raw trees -> prepare.py (both domains) ----------------------
    src_raw, tgt_raw = tmp_path / "src_raw", tmp_path / "tgt_raw"
    _write_market_raw(str(src_raw), n_ids=8,
                      per_split={"bounding_box_train": 4,
                                 "query": 1, "bounding_box_test": 2},
                      seed=5)
    _write_market_raw(str(tgt_raw), n_ids=8,
                      per_split={"bounding_box_train": 6,
                                 "query": 1, "bounding_box_test": 2},
                      seed=9)
    assert prepare_cli.main([
        "--dataset", "market1501", "--raw_dir", str(src_raw),
        "--out_dir", str(data / "market1501")]) == 0
    assert prepare_cli.main([
        "--dataset", "dukemtmc", "--raw_dir", str(tgt_raw),
        "--out_dir", str(data / "dukemtmc")]) == 0
    # Real-disk datasets resolve to DirectoryReID, not the synthetic kind.
    from ssg_tpu.data import datasets

    ds = datasets.create("market1501", root=str(data / "market1501"))
    assert type(ds).__name__ == "DirectoryReID"
    assert len(ds.train) == 32 and ds.num_train_ids == 8

    # --- 2) source pretraining on the prepared tree ---------------------
    rc = pretraining.main([
        "--dataset", "market1501", "--data_dir", str(data),
        "--arch", "resnet18", "--num_features", "16",
        "--height", "64", "--width", "32", "--batch_size", "8",
        "--num_instances", "2", "--epochs", "1", "--dtype", "float32",
        "--print_freq", "1", "--logs_dir", str(tmp_path / "pre"),
    ])
    assert rc == 0

    # --- 3) export the torch .pth the real workflow resumes from --------
    # (asset day: the published source-trained checkpoint is a torch file
    # in the reference's save_checkpoint format with DataParallel prefixes)
    from ssg_tpu.models.convert import flax_to_torch
    from ssg_tpu.utils.serialization import load_checkpoint

    ck = load_checkpoint(str(tmp_path / "pre" / "source_checkpoint"))
    sd = flax_to_torch(
        {"params": ck["params"], "batch_stats": ck["batch_stats"]}
    )
    pth = tmp_path / "source.pth.tar"
    torch.save(
        {"state_dict": {f"module.{k}": torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()},
         "epoch": 1},
        str(pth),
    )

    # --- 4) SSG adaptation resuming from the torch checkpoint -----------
    rc = selftraining.main([
        "--src_dataset", "market1501", "--tgt_dataset", "dukemtmc",
        "--data_dir", str(data), "--arch", "resnet18",
        "--num_features", "16", "--height", "64", "--width", "32",
        "--batch_size", "8", "--num_instances", "2", "--epochs", "1",
        "--iteration", "1", "--rho", "0.05", "--min_samples", "2",
        "--k1", "8", "--k2", "3", "--dtype", "float32",
        "--resume", str(pth), "--logs_dir", str(tmp_path / "ssg"),
    ])
    sys.stdout = sys.__stdout__
    assert rc == 0
    assert (tmp_path / "ssg" / "checkpoint").exists()
    log = (tmp_path / "ssg" / "log.txt").read_text()
    assert "Mean AP" in log  # evaluation ran on the prepared query/gallery
    assert "clusters" in log  # clustering produced pseudo-labels
