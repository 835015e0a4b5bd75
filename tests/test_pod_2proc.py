"""True multi-process pod test: 2 x `jax.distributed.initialize` CPU
processes run the real multi-host train path (pod_worker.py) against a
shared corpus and results folder.

Proves by execution what tests/test_multihost.py unit-tests in-process:
`jax.make_array_from_process_local_data` with non-addressable shards,
identical collective loss on every process, collective Orbax saves from
both hosts, and process-0-only host artifacts.  Reference capability:
`accelerate launch` multi-node (scripts/README.md:16-26,
scripts/CTCLIPTrainer.py:138-140).
"""
import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_pod_train(tmp_path):
    from tests.test_data import VOCAB, _make_dataset

    _make_dataset(tmp_path, n=4)
    (tmp_path / "vocab.txt").write_text("\n".join(VOCAB) + "\n")

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "pod_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "CTCLIP_TEST_PLATFORM")}
    # the workers are plain scripts: only their own dir lands on sys.path,
    # so the repo root must ride PYTHONPATH (prepended — some environments
    # carry a PYTHONPATH of their own, e.g. a backend-plugin site dir)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port), str(tmp_path),
         str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = [json.load(open(tmp_path / f"result_{pid}.json"))
               for pid in (0, 1)]

    # disjoint strided shards whose union is the epoch
    shards = [set(r["shard"]) for r in results]
    assert shards[0].isdisjoint(shards[1])
    assert shards[0] | shards[1] == set(range(4))

    # each host contributed exactly batch/2 local rows to the global batch
    assert all(r["local_batch_rows"] == 4 for r in results)

    # the collective loss is identical on both processes
    assert results[0]["extra_loss"] == pytest.approx(
        results[1]["extra_loss"], abs=1e-6)

    # collective checkpoint committed from both hosts' perspective
    assert all(r["ckpt_step"] == 2 for r in results)
    assert (tmp_path / "run" / "checkpoints").exists()

    # host-side artifacts are process-0-only: exactly one main process, and
    # the metrics JSONL holds one record per step (no duplicate writers)
    assert [r["is_main"] for r in sorted(results, key=lambda r: r["process"])] \
        == [True, False]
    lines = (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    steps = [json.loads(ln)["step"] for ln in lines]
    assert steps == sorted(set(steps)), "duplicate metric writers detected"
