"""Multi-host initialization and helpers.

Replaces the reference init_distributed_mode (utils.py:255-296), which
parses three launcher conventions (torch.distributed env, SLURM, OpenMPI)
and calls NCCL init_process_group. Here the same env surfaces feed
jax.distributed.initialize, and collectives are XLA psums inside jitted
programs — no hand-written comm layer.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed_mode(verbose: bool = True) -> None:
    """Initialize multi-host JAX when launcher env vars are present.

    Recognized (reference parity, utils.py:255-296):
      RANK / WORLD_SIZE [/ MASTER_ADDR / MASTER_PORT]  (torch launch style)
      SLURM_PROCID / SLURM_NTASKS
      OMPI_COMM_WORLD_RANK / OMPI_COMM_WORLD_SIZE
    Single-process when none are set. jax.distributed.initialize also
    auto-detects TPU pod metadata when env vars are absent on Cloud TPU.
    """
    rank = size = None
    if "RANK" in os.environ and "WORLD_SIZE" in os.environ:
        rank = int(os.environ["RANK"])
        size = int(os.environ["WORLD_SIZE"])
    elif "SLURM_PROCID" in os.environ and "SLURM_NTASKS" in os.environ:
        rank = int(os.environ["SLURM_PROCID"])
        size = int(os.environ["SLURM_NTASKS"])
    elif "OMPI_COMM_WORLD_RANK" in os.environ:
        rank = int(os.environ["OMPI_COMM_WORLD_RANK"])
        size = int(os.environ["OMPI_COMM_WORLD_SIZE"])

    if size is None or size <= 1:
        if verbose:
            print("Not using distributed mode (single process)")
        return

    coordinator = os.environ.get("MASTER_ADDR", "127.0.0.1")
    port = os.environ.get("MASTER_PORT", "29500")
    jax.distributed.initialize(
        coordinator_address=f"{coordinator}:{port}",
        num_processes=size,
        process_id=rank,
    )
    if verbose:
        print(
            f"| distributed init (rank {rank}/{size}) "
            f"coordinator {coordinator}:{port}", flush=True
        )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def setup_printing(force: bool = False):
    """Master-only printing (utils.py:211-223): returns a print fn that is
    a no-op on non-zero processes unless force."""
    main = is_main_process()

    def maybe_print(*args, **kwargs):
        if main or force:
            print(*args, **kwargs, flush=True)

    return maybe_print
