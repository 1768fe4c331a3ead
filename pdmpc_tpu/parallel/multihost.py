"""Multi-host execution — the ``parallel_physically`` mode.

Reference: nuc_control/ (SSH/rsync deployment of MATLAB processes to 20
Intel NUCs with per-NUC `main_distributed(i)` invocations, tmux sessions,
and scp result collection). On TPU pods none of that machinery survives:
every host runs the *same* program under ``jax.distributed``, the global
mesh spans all hosts' devices, per-level prediction exchanges ride ICI
within a host and DCN across hosts, and results land on host 0 — no file
shipping.

Launch on every host (the reference's deploy_nuc.sh role is played by the
cluster scheduler / mpirun / GKE):

    python -m pdmpc_tpu.parallel.multihost --coordinator host0:1234 \
        --num-processes 4 --process-id $RANK -- --scenario commonroad \
        --amount 20
"""

from __future__ import annotations

import argparse
import sys


def initialize_distributed(coordinator_address: str, num_processes: int,
                           process_id: int) -> None:
    """Bring up the multi-host runtime (jax.distributed).

    After this, ``jax.devices()`` spans all hosts and the sharded runs in
    parallel/sharded.py scale across DCN unchanged.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pdmpc_tpu.parallel.multihost")
    parser.add_argument("--coordinator", required=True,
                        help="host:port of process 0")
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("rest", nargs=argparse.REMAINDER,
                        help="arguments forwarded to pdmpc_tpu.main")
    args = parser.parse_args(argv)

    initialize_distributed(
        args.coordinator, args.num_processes, args.process_id
    )

    from pdmpc_tpu.main import cli

    rest = args.rest[1:] if args.rest[:1] == ["--"] else args.rest
    rest = rest + ["--computation-mode", "parallel_physically"]
    return cli(rest)


if __name__ == "__main__":
    sys.exit(main())
