"""Device mesh construction and sharding rules.

The reference's only parallelism is NCCL data parallelism via DDP /
DeepSpeed (SURVEY.md section 2.5). The TPU-native design replaces all of it
with one jitted train step over a named mesh:

  axes: ('data', 'fsdp', 'model')
    data  — pure data parallelism (batch sharding); gradient reduction is
            an XLA psum over ICI inserted automatically by jit.
    fsdp  — parameter/optimizer-state sharding (ZeRO-3-like): params are
            sharded along one weight axis and all-gathered by XLA just
            before use. ViT-B does not need it; the axis exists so larger
            models are a mesh-shape change, not a redesign.
    model — tensor parallelism over attention heads / MLP hidden dim.

Batch is sharded over ('data', 'fsdp') jointly so fsdp also contributes
data parallelism when params fit (the standard scaling-book recipe).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any

AXES = ("data", "fsdp", "model")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1 = all remaining devices
    fsdp: int = 1
    model: int = 1

    def resolve(self, n_devices: int) -> Tuple[int, int, int]:
        data = self.data
        if data == -1:
            assert n_devices % (self.fsdp * self.model) == 0, (
                f"{n_devices} devices not divisible by fsdp*model="
                f"{self.fsdp * self.model}"
            )
            data = n_devices // (self.fsdp * self.model)
        assert data * self.fsdp * self.model == n_devices
        return (data, self.fsdp, self.model)


def build_mesh(
    config: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over data and fsdp axes."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place_state(tree, mesh: Mesh):
    """Give every leaf WITHOUT a NamedSharding a replicated placement on
    the mesh.

    Why this matters: once params carry NamedShardings, a jitted train
    step computes in auto-sharding mode and its OUTPUTS — including
    plain scalars like `state.step` and the optax `count`s — come back
    typed on the mesh (`i32[]({Auto: ('data','fsdp','model')})`). If
    those scalars went IN as freshly created single-device arrays
    (`i32[]({})`), the second call's tracing cache key differs from the
    first and the whole step silently RETRACES AND RECOMPILES — a
    second multi-minute remote compile at epoch 1 on the TPU relay
    (diagnosed round 5 via jax_explain_cache_misses). Placing the
    scalars replicated on the mesh up front makes call-1 input types
    identical to every later call's.
    """
    rep = replicated(mesh)

    def put(x):
        if isinstance(getattr(x, "sharding", None), NamedSharding):
            return x
        if jax.process_count() > 1:
            host = np.asarray(x)
            return jax.make_array_from_callback(
                host.shape, rep, lambda idx: host[idx]
            )
        return jax.device_put(x, rep)

    return jax.tree.map(put, tree)


# ---------------------------------------------------------------------------
# Parameter sharding rules (fsdp + tensor parallelism)
# ---------------------------------------------------------------------------


def _spec_for_param(names: Tuple[str, ...], shape: Tuple[int, ...]) -> P:
    """TP/FSDP layout for ViT params.

    model-axis (TP) sharding:
      attn qkv kernel (D, 3H): shard output dim    -> (fsdp, model)
      attn proj kernel (H, D): shard input dim     -> (model, fsdp)
      mlp fc1 kernel (D, 4D):  shard output dim    -> (fsdp, model)
      mlp fc2 kernel (4D, D):  shard input dim     -> (model, fsdp)
      q/v biases (3H,):        shard over model
      fc1 bias (4D,):          shard over model
    Everything else: fsdp on the largest dim where divisible, else
    replicated. LayerNorm/scalars replicated.
    """
    name = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    gparent = names[-3] if len(names) >= 3 else ""

    if name == "qkv_kernel":
        return P("fsdp", "model")
    if name in ("q_bias", "v_bias"):
        return P("model")
    if name == "kv_kernel" or name == "q_kernel":
        return P("fsdp", "model")
    if name == "proj_kernel":
        return P("model", "fsdp")
    if name == "proj_bias":
        return P()
    if parent == "fc1" and name == "kernel":
        return P("fsdp", "model")
    if parent == "fc1" and name == "bias":
        return P("model")
    if parent == "fc2" and name == "kernel":
        return P("model", "fsdp")
    if parent == "patch_embed" and name == "kernel":
        return P(None, "fsdp")
    if name == "kernel" and len(shape) == 2:
        # generic dense (head, encoder_to_decoder): fsdp on input dim
        return P("fsdp", None)
    return P()


def param_sharding_rules(params: Params, mesh: Mesh) -> Params:
    """Pytree of NamedShardings matching `params` structure."""
    from mofo_tpu.train.optim import path_names

    def rule(path, leaf):
        names = path_names(path)
        spec = _spec_for_param(names, leaf.shape)
        # Drop axes that don't divide evenly (tiny test configs).
        fixed = []
        for dim, axis in zip(
            leaf.shape, tuple(spec) + (None,) * (leaf.ndim - len(spec))
        ):
            if axis is None:
                fixed.append(None)
                continue
            ax_size = (
                mesh.shape[axis]
                if isinstance(axis, str)
                else int(np.prod([mesh.shape[a] for a in axis]))
            )
            fixed.append(axis if dim % ax_size == 0 and ax_size > 1 else None)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params: Params, mesh: Mesh) -> Params:
    """Place params according to the sharding rules.

    Single-process: a plain device_put. Multi-process: device_put of a
    host-local value onto a sharding spanning non-addressable devices is
    invalid, so each process materializes its addressable shards from its
    (identical, same-PRNG-init) host copy via make_array_from_callback —
    the standard multi-host parameter placement recipe.
    """
    shardings = param_sharding_rules(params, mesh)
    if jax.process_count() > 1:
        def put(x, s):
            host = np.asarray(x)
            return jax.make_array_from_callback(
                host.shape, s, lambda idx: host[idx]
            )

        return jax.tree.map(put, params, shardings)
    return jax.tree.map(jax.device_put, params, shardings)
