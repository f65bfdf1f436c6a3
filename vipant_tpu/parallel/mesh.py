"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's process/device management
(`/root/reference/train.py:17-35` NCCL bootstrap + DP/DDP modes,
SURVEY.md §2.8): one SPMD program over a ``jax.sharding.Mesh`` with a
``data`` axis (batch sharding → global contrastive negatives via XLA
collectives over ICI) and a ``model`` axis reserved for tower sharding.

Multi-host: call :func:`distributed_init` once per host before mesh
creation; JAX's distributed runtime plays the role of the reference's TCP
rendezvous (`/root/reference/train.py:21-26`).
"""

from __future__ import annotations

import functools
import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap (no-op for single-host)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    data: int = -1,
    model: int = 1,
    pipe: int = 1,
    seq: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """4-axis mesh: ``data`` (batch), ``model`` (tensor parallel), ``pipe``
    (pipeline stages, parallel/pipeline.py), ``seq`` (sequence/ring-attention
    parallelism, parallel/sequence.py). Unused axes have size 1."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (model * pipe * seq) == 0, (
            f"{n} devices not divisible by model={model}·pipe={pipe}·seq={seq}"
        )
        data = n // (model * pipe * seq)
    need = data * model * pipe * seq
    assert need <= n, (
        f"mesh {data}x{model}x{pipe}x{seq} needs more than {n} devices"
    )
    arr = np.asarray(devices[:need]).reshape(data, model, pipe, seq)
    return Mesh(arr, axis_names=("data", "model", "pipe", "seq"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_shard_info(mesh: Mesh) -> tuple:
    """``(shard_id, num_shards)`` of this process's slice of the ``data``
    axis — the host-side dataset sharding coordinates. Memoized per mesh:
    callers sit on per-batch hot paths (loader_device_put, shard_batch)
    and the grid walk is O(#devices).

    Processes whose addressable devices own the SAME data-axis coordinates
    form one data-parallel group and must load IDENTICAL host batches (the
    data axis replicates over them — e.g. ``data=1`` with ``model``
    spanning two hosts). Raw ``process_index/process_count`` coincide with
    this only when the data axis partitions cleanly over processes; using
    them when it doesn't would hand replicated devices DIFFERENT rows and
    mis-assemble the global batch."""
    if jax.process_count() == 1:
        return 0, 1
    return _data_shard_info_cached(mesh, jax.process_index())


@functools.lru_cache(maxsize=16)
def _data_shard_info_cached(mesh: Mesh, pid: int) -> tuple:
    arr = mesh.devices  # [data, model, pipe, seq] device grid
    owned = [
        i
        for i in range(arr.shape[0])
        if any(d.process_index == pid for d in arr[i].flat)
    ]
    assert owned, "this process owns no devices on the mesh"
    nlocal = len(owned)
    data = arr.shape[0]
    assert data % nlocal == 0 and owned == list(
        range(owned[0], owned[0] + nlocal)
    ), f"irregular data-axis process layout: {owned}"
    return owned[0] // nlocal, data // nlocal


def attn_heads_map(model_cfg) -> dict:
    """Per-tower attention head counts for head-block weight sharding
    (``param_shardings``'s ``attn_heads``): param-tree top-level keys are
    the tower names. Shared by the trainer and the serving engine so the
    tower-key convention cannot drift between the two."""
    out: dict = {}
    for k in ("image", "audio", "text"):
        tower = model_cfg.get(k) if model_cfg is not None else None
        if tower is None:
            continue
        try:  # values may be interpolations into absent groups
            h = tower.get("heads")
            if h is not None:
                out[k] = int(h)
        except Exception:  # noqa: BLE001
            pass
    return out


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every array in the batch pytree with its batch axis sharded
    over ``data`` — the analogue of the reference's per-rank batch slicing
    (`/root/reference/cvap/data/image_audio.py:354-360`), except the global
    batch is one logical array.

    Multi-process: each host passes its LOCAL shard (from
    ``shard_for_host`` keyed by ``data_shard_info``); the global array is
    assembled with ``make_array_from_process_local_data`` — a bare
    device_put would treat the local rows as the whole global batch. The
    global row count scales by the number of distinct data-shard GROUPS,
    not by process_count: when model/pipe/seq axes span processes the data
    axis replicates over them and every process in a group supplies the
    same rows."""
    sharding = batch_sharding(mesh)
    nproc = jax.process_count()
    num_shards = data_shard_info(mesh)[1] if nproc > 1 else 1

    def put(x):
        if nproc > 1 and hasattr(x, "shape") and x.ndim >= 1:
            global_shape = (x.shape[0] * num_shards,) + tuple(x.shape[1:])
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x), global_shape
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def param_shardings(
    params: Any,
    mesh: Mesh,
    min_size: int = 1 << 16,
    attn_heads: Any = None,
) -> Any:
    """Tensor-parallel placement over the ``model`` axis, Megatron-style:

    - MLP ``fc`` kernels are column-split (last axis) and ``proj`` kernels
      row-split (first axis) — GSPMD then derives the sharded [B, T, 4C/M]
      intermediate, local GELU, and the closing psum on its own.
    - Attention weights shard BY HEAD BLOCK: the qkv kernel's [C, 3, C]
      layout (nn.layers._QKVParams) is contiguous per head group on the
      last dim, so ``P(None, None, "model")`` (+ ``P(None, "model")`` bias,
      ``P("model", None)`` out-projection rows) puts 1/tp of the attention
      weight bytes on each device; the fused kernel consumes the local
      slices directly (ops/fused_attn.py). Gated on ``attn_heads`` (an int,
      or a dict {top-level param key -> head count}) because the split must
      align to whole heads — with no head info the weights replicate and
      the kernel still head-parallelizes compute by slicing.
    - Token embeddings (``token_embedding`` [vocab, width]) are VOCAB-ROW
      sharded ``P("model", None)`` — the biggest CLAP leaf (49408×512 ≈ 25M
      params) stops being replicated (VERDICT r4 #4). The lookup is a
      gather over a sharded-dim-0 table: GSPMD lowers it to a local gather
      of resident rows + a ``psum`` over the model axis (masked-lookup
      semantics, the Megatron VocabParallelEmbedding recipe) — per-device
      table bytes drop 1/tp and only [B, T, width] activations cross ICI.
    - Final joint-space projections (``post/proj`` / ``text_proj``
      [width, embed_dim]) row-shard ``P("model", None)``: their input's
      width dim is locally produced by the row-sharded out/proj matmuls, so
      the closing psum covers both (no extra collective vs replicating).
    - Stacked pipeline trunks (``.../blocks/...`` leaves with a leading
      layer axis, nn.layers.StackedTransformer) shard that axis over the
      ``pipe`` mesh axis — whole layers live on their stage's devices.
    - Everything else (pos-embs, norms, class tokens — all O(T·C) or
      smaller) replicates: sharding them saves <0.1% of parameter bytes at
      ViT-B scale and adds a collective per use.
    """
    msize = mesh.shape["model"]
    psize = int(mesh.shape.get("pipe", 1)) if "pipe" in mesh.axis_names else 1

    def keys_of(path):
        return "/".join(
            str(getattr(p, "key", getattr(p, "name", ""))) for p in path
        )

    def heads_for(keys: str):
        if attn_heads is None:
            return None
        if isinstance(attn_heads, dict):
            return attn_heads.get(keys.split("/", 1)[0])
        return int(attn_heads)

    # first pass: which fc KERNELS actually shard — their biases follow
    # (a bias must never shard against a replicated kernel: GSPMD would
    # all-gather it every step for nothing)
    sharded_fc: set = set()
    sharded_qkv: set = set()
    if msize > 1:
        for path, x in jax.tree_util.tree_leaves_with_path(params):
            keys = keys_of(path)
            if not hasattr(x, "ndim"):
                continue
            if (
                x.ndim == 2
                and x.size >= min_size
                and keys.endswith("mlp/fc/kernel")
                and x.shape[-1] % msize == 0
            ):
                sharded_fc.add(keys[: -len("kernel")])
            if (
                x.ndim == 3
                and x.size >= min_size
                and keys.endswith("qkv/kernel")
            ):
                sharded_qkv.add(keys[: -len("kernel")])

    def spec(path, x):
        if not hasattr(x, "ndim"):
            return NamedSharding(mesh, P())
        keys = keys_of(path)
        if (
            psize > 1
            and "/blocks/" in f"/{keys}/"
            # NOT the DeiT tower's unrolled trunk, which also sits under a
            # `blocks` module (nn/deit.py) — only StackedTransformer leaves
            # (blocks/<param>, no block_{i} path segment) carry a layer axis
            and not re.search(r"/block_\d+/", f"/{keys}/")
            and x.ndim >= 1
            and x.shape[0] % psize == 0
        ):
            # pipeline-stacked trunk: layer axis over pipe stages
            return NamedSharding(mesh, P("pipe"))
        if msize <= 1:
            return NamedSharding(mesh, P())
        if "/attn/" in f"/{keys}":
            h = heads_for(keys)
            if h and h % msize == 0:
                if keys.endswith("qkv/kernel") and x.ndim == 3 and x.size >= min_size:
                    return NamedSharding(mesh, P(None, None, "model"))
                if (
                    keys.endswith("qkv/bias")
                    and x.ndim == 2
                    # only against a sharded kernel — a bias sharded next
                    # to a replicated (too-small) kernel would be
                    # all-gathered by GSPMD every step for nothing
                    and keys[: -len("bias")] in sharded_qkv
                ):
                    return NamedSharding(mesh, P(None, "model"))
                if (
                    keys.endswith("out/kernel")
                    and x.ndim == 2
                    and x.size >= min_size
                    and x.shape[0] % msize == 0
                ):
                    return NamedSharding(mesh, P("model", None))
        if x.ndim == 2 and x.size >= min_size:
            if keys.endswith("mlp/fc/kernel") and x.shape[-1] % msize == 0:
                return NamedSharding(mesh, P(None, "model"))
            if keys.endswith("mlp/proj/kernel") and x.shape[0] % msize == 0:
                return NamedSharding(mesh, P("model", None))
            # vocab-row-sharded token embedding + row-sharded final
            # projections (see docstring); both close with one psum GSPMD
            # inserts on its own
            if (
                keys.endswith("token_embedding")
                or keys.endswith("post/proj")
                or keys.endswith("text_proj")
            ) and x.shape[0] % msize == 0:
                return NamedSharding(mesh, P("model", None))
        if (
            keys.endswith("mlp/fc/bias")
            and x.ndim == 1
            and x.shape[0] % msize == 0
            and keys[: -len("bias")] in sharded_fc
        ):
            # column-parallel bias rides the sharded intermediate
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(
    params: Any, mesh: Mesh, min_size: int = 1 << 16, attn_heads: Any = None
) -> Any:
    shardings = param_shardings(params, mesh, min_size, attn_heads=attn_heads)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
