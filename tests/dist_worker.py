"""Worker process for the 2-process jax.distributed integration test.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=2 \
       python tests/dist_worker.py PORT PROCESS_ID NUM_PROCESSES

Prints 'RESULT {json}' with the per-step losses; the pytest parent compares
them across processes and against a single-process reference run."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from audio_llama_tpu.parallel import distributed


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    from tests.dist_common import run_steps

    res = run_steps(process_count=nproc)
    print("RESULT " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
