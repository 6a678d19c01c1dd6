"""Multi-process distributed exercise (VERDICT round-1 item #7).

Covers X1/X8: shard_work unit semantics, run_sharded's persist-and-merge
recovery, and a REAL 2-process jax.distributed run over a local CPU
coordinator (the analogue of the reference's worker pool,
DCVC-DC/test_video.py:276-338).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

from dcvc_tpu.parallel.jobs import WorkItem, run_sharded, shard_work

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestShardWork:
    def test_partition_complete_and_disjoint(self):
        items = list(range(11))
        shards = [shard_work(items, i, 3) for i in range(3)]
        got = sorted(x for s in shards for x in s)
        assert got == items
        assert [len(s) for s in shards] == [4, 4, 3]

    def test_single_process_identity(self):
        items = ["a", "b"]
        assert shard_work(items, 0, 1) == items

    def test_default_uses_jax_process_index(self):
        # single-process jax: index 0 of 1
        items = [1, 2, 3]
        assert shard_work(items) == items


class TestRunShardedMerge:
    def test_merges_preexisting_partials(self, tmp_path):
        """Partial results from other (finished) hosts are merged; this is
        the elastic-recovery contract."""
        out = str(tmp_path / "shards")
        os.makedirs(out)
        with open(os.path.join(out, "results_7.json"), "w") as f:
            json.dump({"other/rate_1": {"bpp": 0.5}}, f)
        items = [WorkItem("mine", 0, {})]
        merged = run_sharded(items, lambda it: {"bpp": 0.1}, out_dir=out)
        assert merged == {"other/rate_1": {"bpp": 0.5},
                          "mine/rate_0": {"bpp": 0.1}}

    def test_rerun_overwrites_own_shard(self, tmp_path):
        out = str(tmp_path / "shards")
        items = [WorkItem("s", 0, {})]
        run_sharded(items, lambda it: {"v": 1}, out_dir=out)
        merged = run_sharded(items, lambda it: {"v": 2}, out_dir=out)
        assert merged["s/rate_0"]["v"] == 2


_WORKER = textwrap.dedent("""
    import json, os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dcvc_tpu.parallel.jobs import WorkItem, maybe_init_distributed, run_sharded

    pid, count = maybe_init_distributed()
    assert count == 2, f"expected 2 processes, got {{count}}"

    # prove cross-process comms beyond the rendezvous: allgather process ids
    from jax.experimental import multihost_utils
    import numpy as np
    gathered = multihost_utils.process_allgather(np.asarray([pid]))
    assert sorted(np.asarray(gathered).ravel().tolist()) == [0, 1], gathered

    items = [WorkItem(f"seq{{i}}", i % 2, {{}}) for i in range(5)]
    merged = run_sharded(items, lambda it: {{"pid": pid, "name": it.seq_name}},
                         out_dir=os.environ["OUT_DIR"])
    # everyone waits so the merge sees both shards
    multihost_utils.sync_global_devices("shards_done")
    merged = run_sharded(items, lambda it: {{"pid": pid, "name": it.seq_name}},
                         out_dir=os.environ["OUT_DIR"])
    if pid == 0:
        with open(os.path.join(os.environ["OUT_DIR"], "merged.json"), "w") as f:
            json.dump(merged, f)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_jax_distributed(tmp_path):
    """Real 2-process jax.distributed over a local coordinator: rendezvous,
    allgather over DCN, sharded work + filesystem merge."""
    port = _free_port()
    out_dir = str(tmp_path / "out")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # drop the axon sitecustomize TPU pin
        env.update({
            "JAX_PLATFORMS": "cpu",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "OUT_DIR": out_dir,
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER.format(repo=REPO)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    with open(os.path.join(out_dir, "merged.json")) as f:
        merged = json.load(f)
    # all 5 items present, produced by both processes
    assert len(merged) == 5
    assert {v["pid"] for v in merged.values()} == {0, 1}


class TestWorkerRetry:
    def test_flaky_worker_retried(self, tmp_path):
        calls = {"n": 0}

        def flaky(item):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient")
            return {"ok": True}

        merged = run_sharded([WorkItem("s", 0, {})], flaky,
                             out_dir=str(tmp_path), retries=1)
        assert merged["s/rate_0"] == {"ok": True}
        assert calls["n"] == 2

    def test_permanent_failure_recorded_not_fatal(self, tmp_path):
        def broken(item):
            raise RuntimeError("boom")

        items = [WorkItem("bad", 0, {}), WorkItem("good", 1, {})]
        merged = run_sharded(items, lambda it: {"v": 1}
                             if it.seq_name == "good" else broken(it),
                             out_dir=str(tmp_path), retries=1)
        assert merged["good/rate_1"] == {"v": 1}
        assert "error" in merged["bad/rate_0"]
        assert merged["bad/rate_0"]["attempts"] == 2
