"""CLI argument wiring: flags must land in the config objects.

cmd_train builds a TrainConfig from argparse; these tests pin that the
training-relevant flags (incl. --matching-impl, the Pallas-kernel
selector added for sharded training — losses.multibox_loss) actually
thread through, by intercepting train.fit instead of training.
"""

import numpy as np
import pytest
from PIL import Image


@pytest.fixture
def tiny_label_tree(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    Image.fromarray(
        np.zeros((32, 32, 3), np.uint8)
    ).save(img_dir / "a.jpg")
    label = tmp_path / "label.txt"
    label.write_text("# images/a.jpg\n4 4 8 8 " + " ".join(["-1"] * 15) + "\n")
    return str(label)


def test_train_flags_reach_trainconfig(monkeypatch, tiny_label_tree):
    from jabd_tpu import cli, train

    captured = {}

    def fake_fit(mcfg, tcfg, ds, log_dir=None, checkpoint_manager=None):
        captured["mcfg"] = mcfg
        captured["tcfg"] = tcfg
        captured["ds"] = ds

    monkeypatch.setattr(train, "fit", fake_fit)
    cli.main(
        [
            "train",
            "--label-txt", tiny_label_tree,
            "--model", "mnet_v3_plain",
            "--batch-size", "3",
            "--input-size", "128",
            "--epochs", "7",
            "--freeze-epochs", "2",
            "--microbatches", "2",
            "--device-augment",
            "--matching-impl", "pallas_interpret",
        ]
    )
    t = captured["tcfg"]
    assert t.batch_size == 3
    assert t.image_size == 128
    assert t.total_epochs == 7
    assert t.freeze_epochs == 2
    assert t.microbatches == 2
    assert t.device_augment is True
    assert t.matching_impl == "pallas_interpret"
    assert t.fsdp is False
    assert captured["mcfg"].name == "mnet_v3_plain"
    assert len(captured["ds"]) == 1


def test_train_fsdp_flag_reaches_trainconfig(monkeypatch, tiny_label_tree):
    from jabd_tpu import cli, train

    captured = {}

    def fake_fit(mcfg, tcfg, ds, log_dir=None, checkpoint_manager=None):
        captured["tcfg"] = tcfg

    monkeypatch.setattr(train, "fit", fake_fit)
    cli.main(
        [
            "train",
            "--label-txt", tiny_label_tree,
            "--model", "mnet_v3_plain",
            "--fsdp",
        ]
    )
    assert captured["tcfg"].fsdp is True


def test_spatial_and_data_parallel_mutually_exclusive(tmp_path):
    """--spatial + --data-parallel must refuse before any device work."""
    from jabd_tpu import cli

    with pytest.raises(SystemExit, match="mutually exclusive"):
        cli.main(
            [
                "dir-predict",
                "--model", "mnet_v3_plain",
                "--input-dir", str(tmp_path),
                "--out", str(tmp_path / "o"),
                "--spatial",
                "--data-parallel",
            ]
        )


def test_recognition_fsdp_requires_shard_head(tmp_path):
    """recognition train --fsdp without --shard-head must refuse with
    guidance (the FSDP placement rides the sharded-step jit)."""
    from jabd_tpu.recognition import cli as rcli

    # a minimal ImageFolder tree so dataset construction succeeds
    d = tmp_path / "idA"
    d.mkdir()
    Image.fromarray(np.zeros((112, 112, 3), np.uint8)).save(d / "0.jpg")

    with pytest.raises(SystemExit, match="shard-head"):
        rcli.main(
            [
                "train",
                "--data-root", str(tmp_path),
                "--arch", "ir_18",
                "--epochs", "1",
                "--batch-size", "1",
                "--fsdp",
            ]
        )
