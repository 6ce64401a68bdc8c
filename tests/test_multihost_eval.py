"""End-to-end 2-process `tools/test.py` eval — the reference's dist_test.sh
path: per-rank dataset slice -> eval -> full-dict merge -> single metric
computation (VERDICT r1 gap #3 'Done' bar).

Spawns two real processes running the actual CLI with the multihost launcher
env (tools/scripts/multihost_test.sh contract); asserts rank 0's merged
result.pkl contains every dataset frame exactly once.
"""

import os
import pickle
import socket
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
SMOKE = REPO / "tools" / "cfgs" / "synthetic" / "smoke.yaml"


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cli_eval(tmp_path):
    from radardistill_tpu.config import ConfigDict, cfg_from_yaml_file
    from radardistill_tpu.data.loader import build_dataloader
    from radardistill_tpu.models import build_network
    from radardistill_tpu.train.checkpoint import CheckpointManager
    from radardistill_tpu.train.optim import build_optimizer
    from radardistill_tpu.train.train_step import create_train_state

    # ---- seed a checkpoint the CLI can evaluate (random init is fine)
    cfg = ConfigDict()
    cfg_from_yaml_file(str(SMOKE), cfg)
    ds, loader = build_dataloader(cfg.DATA_CONFIG, cfg.CLASS_NAMES, 2, training=False)
    info = {
        "grid_size": tuple(int(x) for x in ds.grid_size[:2]),
        "voxel_size": tuple(float(x) for x in ds.voxel_size),
        "point_cloud_range": tuple(float(x) for x in ds.point_cloud_range),
        "class_names": tuple(cfg.CLASS_NAMES),
    }
    model = build_network(cfg.MODEL, info, compute_dtype=jnp.bfloat16)
    batch, _ = next(iter(loader))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    tx, _ = build_optimizer(ConfigDict(OPTIMIZER="adam", LR=1e-3), None, total_steps=1)
    state = create_train_state(model, tx, batch)
    ckpt_dir = tmp_path / "ckpt"
    CheckpointManager(ckpt_dir).save(jax.device_get(state), epoch=1)

    # ---- run the real CLI on 2 processes
    port = _free_port()
    procs = []
    for rank in (0, 1):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # 1 CPU device per rank
        env.update({
            "PYTHONPATH": str(REPO) + os.pathsep + env.get("PYTHONPATH", ""),
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_PROCESS_COUNT": "2",
            "JAX_PROCESS_INDEX": str(rank),
            "JAX_COMPILATION_CACHE_DIR": str(REPO / "tests" / ".jax_cache"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tools" / "test.py"),
             "--cfg_file", str(SMOKE), "--platform", "cpu",
             "--ckpt_dir", str(ckpt_dir)],
            cwd=tmp_path, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    # ---- the merged dump must contain each frame exactly once
    results = list(tmp_path.glob("output/*/*/eval/eval_*/result.pkl"))
    assert results, outs[0][-2000:]
    with open(results[0], "rb") as f:
        det_annos = pickle.load(f)
    frame_ids = [d["frame_id"] for d in det_annos]
    assert len(frame_ids) == len(ds)
    assert len(set(frame_ids)) == len(ds)
