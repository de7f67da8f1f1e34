"""Multi-host data-parallel input path.

Validates the per-host pipeline the reference never had (its DataParallel
is single-process): every process derives the same global batch order,
loads only its slice (DataLoader process_shard), and
shard_batch_fn assembles a global jax.Array via
jax.make_array_from_process_local_data.

The cross-process test spawns 2 real processes (each a 2-device CPU
backend joined through jax.distributed) and checks, process-locally, that
the assembled global array has the global shape and that each process's
addressable shards hold exactly its own rows — no collectives required.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
import numpy as np
import jax

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="localhost:" + port,
    num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
assert jax.local_device_count() == 2
assert jax.device_count() == 2 * nproc

sys.path.insert(0, os.environ["REPO"])
from monodetr_tpu.parallel.mesh import make_mesh, shard_batch_fn

mesh = make_mesh()
place = shard_batch_fn(mesh)

# global batch of 8 rows; this process holds rows [pid*4, pid*4+4)
local = np.arange(pid * 4, pid * 4 + 4, dtype=np.float32)[:, None] * np.ones(
    (1, 3), np.float32)
batch = place({"x": local})
arr = batch["x"]
assert arr.shape == (4 * nproc, 3), arr.shape
got = sorted(
    int(row[0]) for s in arr.addressable_shards for row in np.asarray(s.data))
want = sorted(range(pid * 4, pid * 4 + 4))
assert got == want, (got, want)
print(f"proc {pid}: OK {got}")
"""


# Exactly-one-writer gating (reference save_on_master, utils/misc.py:404-407):
# both processes attempt the trainer checkpoint save and the tester
# results-txt write; only process 0's files may appear.
_GATE_WORKER = r"""
import os, sys, types
import jax

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
outdir = sys.argv[4]
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="localhost:" + port,
    num_processes=nproc, process_id=pid)

sys.path.insert(0, os.environ["REPO"])
from monodetr_tpu.eval.tester import Tester
from monodetr_tpu.train.trainer import Trainer
from monodetr_tpu.utils.misc import is_main_process

assert is_main_process() == (pid == 0)

class _Logger:
    def info(self, *a):
        pass

# tester: each process tries to write a txt named after its own pid, so a
# gating failure shows up as an extra file
dataset = types.SimpleNamespace(class_name=["Car"], max_objs=50,
                                cls_mean_size=None)
dataloader = types.SimpleNamespace(dataset=dataset)
os.chdir(outdir)
t = Tester({"mode": "single"}, types.SimpleNamespace(apply=None), None,
           dataloader, _Logger(), train_cfg={"save_path": "out/"},
           model_name="m")
t.save_results({pid: [[1, 0.5] + [0.0] * 12]})

# trainer: drive the gated save/eval method on a skeleton instance
tr = object.__new__(Trainer)
tr.cfg = {"save_all": True}
tr.output_dir = os.path.join(outdir, "out", "m")
tr.params = {"w": jax.numpy.zeros(2)}
tr.opt_state = {}
tr.epoch = 3 + pid  # distinct names: a gating failure leaves 2 checkpoints
tr.tester = None
tr.logger = _Logger()
tr._save_and_eval_epoch(0.0, 0)
print(f"proc {pid}: gate OK")
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_batch_assembly(tmp_path):
    port = str(_free_port())
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["REPO"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        procs.append(subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: OK" in out


def test_two_process_exactly_one_writer(tmp_path):
    port = str(_free_port())
    script = tmp_path / "gate_worker.py"
    script.write_text(_GATE_WORKER)
    outdir = tmp_path / "out"
    outdir.mkdir()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["REPO"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        procs.append(subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port, str(outdir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: gate OK" in out
    # tester results: only process 0's txt exists
    data = outdir / "out" / "m" / "outputs" / "data"
    assert sorted(os.listdir(data)) == ["000000.txt"]
    # trainer checkpoints: only process 0's epoch file exists
    ckpts = [f for f in os.listdir(outdir / "out" / "m")
             if f.startswith("checkpoint")]
    assert ckpts == ["checkpoint_epoch_3.pth"]


def test_loader_process_shard_slices_global_batches():
    from monodetr_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            img = np.full((2, 2, 3), i, np.float32)
            calib = np.zeros((3, 4), np.float32)
            tgt = {"mask": np.zeros(5, bool),
                   "calibs": np.zeros((5, 3, 4), np.float32),
                   "img_size": np.array([2.0, 2.0], np.float32)}
            return img, calib, tgt, {"img_id": i, "img_size": (2, 2)}

    def rows(loader):
        out = []
        for batch, infos in loader:
            out.append((batch["images"][:, 0, 0, 0].astype(int).tolist(),
                        batch["valid"].tolist(), len(infos)))
        return out

    full = rows(DataLoader(DS(), batch_size=4, shuffle=False, num_workers=1))
    p0 = rows(DataLoader(DS(), batch_size=4, shuffle=False, num_workers=1,
                         process_shard=(0, 2)))
    p1 = rows(DataLoader(DS(), batch_size=4, shuffle=False, num_workers=1,
                         process_shard=(1, 2)))

    assert len(full) == len(p0) == len(p1) == 3
    for (gi, gv, _), (ai, av, _), (bi, bv, _) in zip(full, p0, p1):
        assert ai + bi == gi          # concatenated local rows == global batch
        assert av + bv == gv          # valid flags partition likewise
    # last global batch: 10 samples -> 2 valid of 4; process 0 gets both
    # valid rows, process 1 gets only padding
    assert p0[-1][1] == [True, True] and p0[-1][2] == 2
    assert p1[-1][1] == [False, False] and p1[-1][2] == 0

    # shuffled: same seed/epoch => identical global order across processes
    s0 = DataLoader(DS(), batch_size=4, shuffle=True, num_workers=1,
                    process_shard=(0, 2))
    s1 = DataLoader(DS(), batch_size=4, shuffle=True, num_workers=1,
                    process_shard=(1, 2))
    g = DataLoader(DS(), batch_size=4, shuffle=True, num_workers=1)
    for l in (s0, s1, g):
        l.set_epoch(3)
    for (gi, _, _), (ai, _, _), (bi, _, _) in zip(rows(g), rows(s0), rows(s1)):
        assert ai + bi == gi

    with pytest.raises(ValueError):
        DataLoader(DS(), batch_size=5, shuffle=False, process_shard=(0, 2))
