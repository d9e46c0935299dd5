"""SPMD partitioning shim for Pallas kernels.

XLA treats a custom call (what a pallas_call lowers to) as opaque: under
a sharded jit the SPMD partitioner ALL-GATHERS its operands and runs the
kernel replicated on every device — silently destroying the scaling of
exactly the kernels this framework exists for (measured on an 8-device
mesh: flash attention under a ('data',) batch sharding emits all-gather
and returns a fully-replicated output). The reference never hits this
(torch DDP replicates the model and shards only the loader,
run_mae_pretraining.py:187-206); a jit-over-mesh design does.

`jax.experimental.custom_partitioning` is the surgical fix: every
operand and result of our kernels carries the batch in dim 0, so we
declare dim-0 sharding propagation and the partitioner runs the kernel
per-shard, keeping the batch sharding flowing through with zero
collectives. Both partitioner generations are served: the einsum-like
`sharding_rule` (Shardy, the default here) and the
infer/propagate callbacks (GSPMD).

The wrapped impl MUST be shape-polymorphic in dim 0: grids and
out_shapes must be computed from the runtime operand shapes, because
inside the per-shard lowering the batch extent is the LOCAL one.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec


def _dim0(sharding) -> object:
    """The dim-0 entry of a (Named)Sharding's PartitionSpec, else None."""
    spec = getattr(sharding, "spec", None)
    if spec is None:
        return None
    return spec[0] if len(spec) else None


def _dim0_sharding(mesh, batch_axes):
    def mk(info):
        nd = len(info.shape)
        return NamedSharding(
            mesh, PartitionSpec(*((batch_axes,) + (None,) * (nd - 1)))
        )

    return mk


def _batch_rule(arg_ranks, result_ranks):
    """Einsum-like Shardy rule: factor 'b' on every dim 0, a unique
    need-replication factor on every other dimension."""
    fresh = iter(range(10**6))

    def side(ranks):
        terms = []
        for r in ranks:
            terms.append(
                " ".join(["b"] + [f"f{next(fresh)}" for _ in range(r - 1)])
            )
        return ", ".join(terms)

    rule = f"{side(arg_ranks)} -> {side(result_ranks)}"
    total = sum(arg_ranks) + sum(result_ranks) - len(arg_ranks) - len(
        result_ranks
    )
    return rule, tuple(f"f{i}" for i in range(total))


def batch_dim0_call(impl: Callable, *args):
    """Run ``impl(*args)`` with dim-0 (batch) SPMD partitioning.

    All of ``args`` and all of impl's outputs must be arrays whose dim 0
    is the batch. Under a sharded jit, the kernel executes on local
    shards; on a single device or with unsharded inputs it is the plain
    call. Non-dim-0 shardings on the operands are reshaped away by the
    partitioner (our kernels need the full sequence/feature axes
    resident anyway).
    """
    f = custom_partitioning(impl)

    def infer_sharding_from_operands(mesh, arg_infos, result_infos):
        mk = _dim0_sharding(mesh, _dim0(arg_infos[0].sharding))
        return jax.tree.map(mk, result_infos)

    def propagate_user_sharding(mesh, user_shape):
        return jax.tree.map(lambda x: x.sharding, user_shape)

    def partition(mesh, arg_infos, result_infos):
        mk = _dim0_sharding(mesh, _dim0(arg_infos[0].sharding))
        arg_shardings = tuple(mk(a) for a in arg_infos)
        result_shardings = jax.tree.map(mk, result_infos)
        return mesh, impl, result_shardings, arg_shardings

    out_shapes = jax.eval_shape(impl, *args)
    rule, repl = _batch_rule(
        [a.ndim for a in args],
        [o.ndim for o in jax.tree.leaves(out_shapes)],
    )
    if jax.config.jax_use_shardy_partitioner:
        f.def_partition(
            partition=partition,
            sharding_rule=rule,
            need_replication_factors=repl,
        )
    else:
        f.def_partition(
            infer_sharding_from_operands=infer_sharding_from_operands,
            propagate_user_sharding=propagate_user_sharding,
            partition=partition,
        )
    return f(*args)
