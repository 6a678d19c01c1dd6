"""Host-level job parallelism: (sequence x rate) work distribution.

TPU-native equivalent of X1 (SURVEY.md §2.6): the reference fans out with a
spawn ProcessPoolExecutor and round-robins GPUs per process
(DCVC-DC/test_video.py:276-338). On a TPU pod slice the analogue is one
process per host (jax.distributed), each driving its local chip(s); GOPs and
(sequence x rate) work items are sharded across hosts by index, results
gathered over DCN via the multihost utils (or the filesystem for the CLI).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable, Sequence


@dataclass
class WorkItem:
    seq_name: str
    rate_idx: int
    payload: dict


def shard_work(items: Sequence, process_index: int | None = None,
               process_count: int | None = None) -> list:
    """Static round-robin assignment of work items to this host."""
    if process_index is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    return [it for i, it in enumerate(items)
            if i % process_count == process_index]


def run_sharded(items: Sequence[WorkItem], worker: Callable[[WorkItem], dict],
                out_dir: str = "out/shards", retries: int = 1) -> dict:
    """Run this host's share, persist partial results, merge what exists.

    Each host writes out/shards/results_{pid}.json; the lowest-index host
    merges everything present (hosts that haven't finished are skipped by
    the merge and picked up on re-run — elastic-ish recovery without a
    coordinator). A worker exception is retried ``retries`` times, then
    recorded as an ``{"error": ...}`` entry instead of killing the host's
    whole shard (the reference's pool loses the worker process instead,
    DCVC-DC/test_video.py:276-338)."""
    import jax

    pid = jax.process_index()
    mine = shard_work(items)
    results = {}
    for item in mine:
        key = f"{item.seq_name}/rate_{item.rate_idx}"
        for attempt in range(retries + 1):
            try:
                results[key] = worker(item)
                break
            except Exception as e:  # noqa: BLE001
                if attempt == retries:
                    results[key] = {"error": repr(e), "attempts": attempt + 1}

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"results_{pid}.json"), "w") as f:
        json.dump(results, f)

    merged = {}
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("results_") and name.endswith(".json"):
            with open(os.path.join(out_dir, name)) as f:
                merged.update(json.load(f))
    return merged


def maybe_init_distributed():
    """Initialize jax.distributed when launched under a multi-host runner.

    Cluster schedulers (TPU pods, SLURM) are auto-detected by
    ``jax.distributed.initialize()``; manual launches (and the 2-process CPU
    test) pass JAX_COORDINATOR_ADDRESS [+ JAX_NUM_PROCESSES/JAX_PROCESS_ID]
    explicitly."""
    import jax

    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if addr:
        kwargs = {"coordinator_address": addr}
        if "JAX_NUM_PROCESSES" in os.environ:
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()
