"""Sharding rules: map the model/optimizer pytree onto the (data, model) mesh.

Tensor-parallel rules target the matmul-heavy parameters of the PCmer stack
and the Unit2Control output head (column-parallel QKV / up-projections,
row-parallel output projections — the standard Megatron-style pairing, so a
single all-reduce closes each block). Everything else (norms, embeddings,
small convs) is replicated. Batches shard over 'data'; XLA inserts the
gradient psum.
"""
from __future__ import annotations

import re
from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (path regex, PartitionSpec) — first match wins. Paths are '/'-joined.
TP_RULES = [
    # attention: column-parallel QKV, row-parallel output
    (r".*attn/to_q/kernel$", P(None, "model")),
    (r".*attn/to_k/kernel$", P(None, "model")),
    (r".*attn/to_v/kernel$", P(None, "model")),
    (r".*attn/to_q/bias$", P("model")),
    (r".*attn/to_k/bias$", P("model")),
    (r".*attn/to_v/bias$", P("model")),
    (r".*attn/to_out/kernel$", P("model", None)),
    # conformer conv module: column-parallel up, row-parallel down
    (r".*conv/Dense_0/kernel$", P(None, "model")),
    (r".*conv/Dense_0/bias$", P("model")),
    (r".*conv/Conv1d_0/Conv_0/kernel$", P(None, None, "model")),
    (r".*conv/Conv1d_0/Conv_0/bias$", P("model")),
    (r".*conv/Dense_1/kernel$", P("model", None)),
    # output head: column-parallel over the control-parameter dim
    (r".*dense_out/v$", P(None, "model")),
    (r".*dense_out/g$", P("model")),
    (r".*dense_out/bias$", P("model")),
]


def _spec_for_path(path: str) -> P:
    for pattern, spec in TP_RULES:
        if re.match(pattern, path):
            return spec
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree matching `params` via TP_RULES."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )

    shardings = {}
    for kp, leaf in flat:
        p = path_str(kp)
        spec = _spec_for_path(p)
        # guard: only apply specs that divide the dims evenly
        ok = True
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis]
            if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                ok = False
        shardings[p] = NamedSharding(mesh, spec if ok else P())

    treedef = jax.tree_util.tree_structure(params)
    leaves = [shardings[path_str(kp)] for kp, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def shard_params(params: Any, mesh: Mesh) -> Any:
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch: Dict, mesh: Mesh, batch_axis: int = 0) -> Dict:
    """Shard every array's batch dimension over the 'data' mesh axis.

    batch_axis=1 handles K-step dispatch trees (train.steps_per_dispatch):
    arrays are (K, B, ...) with the scan axis leading, so 'data' rides
    axis 1 and the K microbatch axis stays replicated."""
    ns = NamedSharding(mesh, P(*([None] * batch_axis + ["data"])))
    return {k: jax.device_put(v, ns) for k, v in batch.items()}


def shard_train_state(state, mesh: Mesh):
    """Shard a TrainState: params (and the Adam moments, which share the
    params' tree structure) per TP rules; everything else replicated."""
    import optax

    p_sh = param_shardings(state.params, mesh)
    rep = NamedSharding(mesh, P())

    def map_opt_item(item):
        if isinstance(item, optax.ScaleByAdamState):
            return item._replace(
                count=jax.device_put(item.count, rep),
                mu=jax.device_put(item.mu, p_sh),
                nu=jax.device_put(item.nu, p_sh),
            )
        return jax.tree.map(lambda x: jax.device_put(x, rep), item)

    opt_state = tuple(map_opt_item(item) for item in state.opt_state)
    return state.replace(
        step=jax.device_put(state.step, rep),
        params=jax.device_put(state.params, p_sh),
        constants=jax.device_put(state.constants, rep),
        opt_state=opt_state,
    )
