"""Tester checkpoint-selection semantics vs reference tester_helper.py.

The reference (lib/helpers/tester_helper.py:26-62) picks checkpoints as:
  - mode 'single' (or save_all False): checkpoint_epoch_{cfg.checkpoint}.pth
    when save_all, else checkpoint_best.pth;
  - mode 'all' + save_all: every checkpoint_epoch_N.pth under the output
    dir with N >= cfg.checkpoint, evaluated in mtime order.
These tests drive Tester.test() against a fake output dir and record which
checkpoints get loaded.
"""

import os
import types

import pytest

from monodetr_tpu.eval import tester as tester_mod


class _Logger:
    def info(self, *a):
        pass


def _make_tester(tmp_path, monkeypatch, mode, checkpoint, save_all):
    dataset = types.SimpleNamespace(class_name=["Car"], max_objs=50,
                                    cls_mean_size=None)
    dataloader = types.SimpleNamespace(dataset=dataset)
    model = types.SimpleNamespace(apply=lambda *a, **k: None)
    cfg = {"mode": mode, "checkpoint": checkpoint}
    train_cfg = {"save_all": save_all, "save_path": str(tmp_path) + "/"}
    t = tester_mod.Tester(cfg, model, params=None, dataloader=dataloader,
                          logger=_Logger(), train_cfg=train_cfg,
                          model_name="m")

    loaded = []
    monkeypatch.setattr(
        tester_mod, "load_checkpoint",
        lambda path, logger: loaded.append(os.path.basename(path))
        or {"model_state": {}})
    monkeypatch.setattr(tester_mod.jax, "device_put", lambda x: x)
    t.inference = lambda: None
    t.evaluate = lambda: None
    return t, loaded


def _touch(d, name, mtime):
    p = os.path.join(d, name)
    with open(p, "wb") as f:
        f.write(b"x")
    os.utime(p, (mtime, mtime))
    return p


def test_all_mode_filters_epoch_and_sorts_by_mtime(tmp_path, monkeypatch):
    t, loaded = _make_tester(tmp_path, monkeypatch, "all", 10, True)
    d = t.output_dir
    os.makedirs(d)
    # below start epoch: skipped; non-epoch names: skipped
    _touch(d, "checkpoint_epoch_5.pth", 100)
    _touch(d, "checkpoint.pth", 150)
    _touch(d, "checkpoint_best.pth", 160)
    # mtime order deliberately != epoch order
    _touch(d, "checkpoint_epoch_30.pth", 200)
    _touch(d, "checkpoint_epoch_10.pth", 300)
    _touch(d, "checkpoint_epoch_20.pth", 250)
    t.test()
    assert loaded == ["checkpoint_epoch_30.pth", "checkpoint_epoch_20.pth",
                      "checkpoint_epoch_10.pth"]


def test_all_mode_without_save_all_degrades_to_best(tmp_path, monkeypatch):
    # reference: 'all' with save_all False falls into the single branch
    t, loaded = _make_tester(tmp_path, monkeypatch, "all", 0, False)
    os.makedirs(t.output_dir)
    _touch(t.output_dir, "checkpoint_best.pth", 100)
    _touch(t.output_dir, "checkpoint_epoch_3.pth", 120)
    t.test()
    assert loaded == ["checkpoint_best.pth"]


def test_single_mode_with_save_all_uses_epoch_checkpoint(tmp_path, monkeypatch):
    t, loaded = _make_tester(tmp_path, monkeypatch, "single", 7, True)
    os.makedirs(t.output_dir)
    _touch(t.output_dir, "checkpoint_epoch_7.pth", 100)
    _touch(t.output_dir, "checkpoint_best.pth", 110)
    t.test()
    assert loaded == ["checkpoint_epoch_7.pth"]


def test_results_dir_honors_save_path(tmp_path, monkeypatch):
    # reference tester_helper.py:113 keeps result txts under the run dir
    # (<save_path>/<model_name>/outputs/data); a non-default save_path must
    # not silently split checkpoints and results
    t, _ = _make_tester(tmp_path, monkeypatch, "single", 0, False)
    assert t.results_dir == os.path.join(t.output_dir, "outputs", "data")
    t2 = tester_mod.Tester.__new__(tester_mod.Tester)
    t2.output_dir = os.path.join(str(tmp_path), "elsewhere", "m")
    t2.save_results({3: [[1, 0.5] + [0.0] * 12]})
    assert os.path.exists(
        os.path.join(t2.output_dir, "outputs", "data", "000003.txt"))


def test_single_mode_best_with_latest_fallback(tmp_path, monkeypatch):
    t, loaded = _make_tester(tmp_path, monkeypatch, "single", 0, False)
    os.makedirs(t.output_dir)
    _touch(t.output_dir, "checkpoint.pth", 100)
    t.test()
    assert loaded == ["checkpoint.pth"]
