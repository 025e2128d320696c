"""Checkpoint/resume: Orbax for array state + JSON sidecar for bookkeeping.

Reference semantics (trainer.py:188-233, utils.py:15-44): checkpoints live
in ``{model_folder}/params.{n}`` with a separate training-bookkeeping file;
resume scans for the latest index. Improvements over the reference:

- optimizer state IS checkpointed (the reference loses it on resume);
- the latest-checkpoint regex captures all digits (the reference's
  ``params.(\\d)+`` captures one — SURVEY.md §8.11 — so resume after >= 10
  checkpoints picked the wrong file);
- bookkeeping is JSON, not pickle.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train_step import TrainState

_CKPT_RE = re.compile(r"^params\.(\d+)$")
TRAIN_STATE_FILE = "train_state.json"


@dataclasses.dataclass
class TrainingProgress:
    """Bookkeeping across checkpoints (reference TrainingState, trainer.py:60-65)."""

    n_checkpoints: int = 0
    n_batches: int = 0
    num_checkpoints_not_improved: int = 0
    best_reconstruction_loss: float = float("inf")

    def save(self, model_folder: str) -> None:
        with open(os.path.join(model_folder, TRAIN_STATE_FILE), "w") as fh:
            json.dump(dataclasses.asdict(self), fh)

    @classmethod
    def load(cls, model_folder: str) -> "TrainingProgress":
        with open(os.path.join(model_folder, TRAIN_STATE_FILE)) as fh:
            return cls(**json.load(fh))


def checkpoint_indices(model_folder: str):
    """Sorted params.N indices present in the folder (may be empty)."""
    return sorted(
        int(m.group(1))
        for m in (_CKPT_RE.match(n) for n in os.listdir(model_folder))
        if m
    )


def get_latest_checkpoint_index(model_folder: str) -> int:
    """Largest N among params.N entries (reference: utils.py:15-25, fixed)."""
    indices = checkpoint_indices(model_folder)
    if not indices:
        raise ValueError(f"No checkpoints found in {model_folder}")
    return indices[-1]


def checkpoint_path(model_folder: str, index: int) -> str:
    return os.path.abspath(os.path.join(model_folder, f"params.{index}"))


def _dist_state():
    """The jax.distributed coordination state, or None.

    NOT ``jax.process_count()``: that consults the DEFAULT backend, which
    under the axon TPU plugin is the single-process tunnel even when the
    actual multi-process world is the gloo CPU fleet (jax.process_count()
    == 1 while jax.process_count(backend="cpu") == 2 — measured; this is
    also why orbax's own multihost machinery silently no-ops here and
    cannot be relied on)."""
    try:
        from jax._src import distributed

        gs = distributed.global_state
        if gs.client is not None and (gs.num_processes or 1) > 1:
            return gs
    except Exception:
        pass
    return None


def _multiprocess() -> bool:
    return _dist_state() is not None


def _dist_barrier(name: str, timeout_ms: int = 600_000) -> None:
    gs = _dist_state()
    if gs is not None:
        gs.client.wait_at_barrier(name, timeout_ms)


def _gather_to_host(tree, fetch: bool = True):
    """Fully replicate every sharded leaf over its mesh, then fetch.

    COLLECTIVE: every process must call this with the same tree. The
    ``out_shardings``-only jitted identity compiles to XLA all-gathers
    over ICI/DCN; afterwards each leaf is fully replicated, so a plain
    host fetch is legal on every process. Used ONLY on the skewed-backend
    path (see save_checkpoint — the honest-multihost path hands orbax the
    sharded arrays directly and never gathers); there the network cost is
    O(params) per save but host memory is bounded: ``fetch=False``
    (non-primary processes) participates in the collectives and
    materializes NOTHING on the host, and the fetching primary pulls one
    leaf at a time (device_get syncs per leaf, so replicated device
    buffers are freed as the walk advances rather than all held at
    once)."""
    def one(x):
        if isinstance(x, jax.Array) and not x.sharding.is_fully_replicated:
            x = _replicate_fn(x.sharding.mesh)(x)
        return jax.device_get(x) if fetch else None

    return jax.tree.map(one, tree)


@functools.lru_cache(maxsize=8)
def _replicate_fn(mesh):
    """One cached jitted all-gather identity per mesh: jit caching is
    keyed on function identity, so building a fresh lambda per leaf per
    save would re-lower and recompile the same program dozens of times
    every checkpoint tick."""
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.jit(
        lambda a: a, out_shardings=NamedSharding(mesh, PartitionSpec())
    )


def save_checkpoint(
    model_folder: str,
    index: int,
    state: TrainState,
    checkpointer: Optional[ocp.AsyncCheckpointer] = None,
) -> None:
    """Write params.{index}. With a caller-owned ``checkpointer`` the save is
    ASYNC: this returns once the device->host snapshot is taken (safe even
    though the train step donates the state), while serialization and the
    disk write proceed on orbax's background threads — checkpoint ticks no
    longer stall the device. Call ``checkpointer.wait_until_finished()``
    before relying on the files (the Trainer does this on exit and before
    any restore). Without one, the save blocks until durable (simple API).

    Multi-process runs (a live jax.distributed world): this is a
    COLLECTIVE — every process must call it with its (sharded) state.
    Two sub-cases, keyed off whether orbax's own multihost machinery is
    live (it consults ``jax.process_count()``, i.e. the DEFAULT backend):

    - Honest world view (real pods; CPU fleets with jax_platforms forced):
      ``jax.process_count() == world size``, so orbax's save() is itself a
      collective with primary-writes-alone baked in — every process calls
      it WITH THE SHARDED ARRAYS, no gather at all: orbax/tensorstore
      writes each process's own shards (peak host memory per save is
      O(largest local shard), not O(params) — the r03 full-replication
      save was a measured O(params)-per-host cliff, VERDICT r03 item 9).
      Primary-only calling would DEADLOCK here (the primary waits in
      orbax's sync_global_processes while non-primaries wait at our
      barrier — observed on the 2-process CPU harness).
    - Skewed default backend (axon plugin keeps priority: process_count()
      == 1 while the gloo world is larger, see _dist_state): orbax's
      barriers all no-op and cannot write cross-process shards, so leaves
      are all-gathered per leaf (sequential, device buffers freed as the
      walk advances), materialized on the PRIMARY ONLY (_gather_to_host
      fetch=False elsewhere), and the primary writes an ordinary
      single-process checkpoint while the others wait at an explicit
      coordination-service barrier.

    Either way the bytes on disk are the full global arrays, so any
    process count (including single-process inference) can restore any
    checkpoint.
    """
    path = checkpoint_path(model_folder, index)
    own = checkpointer is None
    ckptr = ocp.StandardCheckpointer() if own else checkpointer
    ckptr.wait_until_finished()  # at most one save in flight
    import shutil

    if _multiprocess():
        gs = _dist_state()
        if jax.process_count() == (gs.num_processes or 1):
            # Orbax's multihost protocol is live: its save is collective
            # and shard-native. Clear any stale target on the primary,
            # fence, then every process enters the save together with its
            # sharded state — nothing is gathered or replicated.
            tree = {
                "step": np.asarray(jax.device_get(state.step)),
                "params": state.params,
                "opt_state": state.opt_state,
                "rng": np.asarray(
                    jax.device_get(jax.random.key_data(state.rng))
                ),
            }
            if gs.process_id == 0 and os.path.exists(path):
                shutil.rmtree(path)
            _dist_barrier(f"mst-ckpt-clear-{index}")
            ckptr.save(path, tree)
            if own:
                ckptr.wait_until_finished()
            return
        primary = gs.process_id == 0
        host_tree = {
            "step": np.asarray(jax.device_get(state.step)),
            "params": _gather_to_host(state.params, fetch=primary),
            "opt_state": _gather_to_host(state.opt_state, fetch=primary),
            "rng": np.asarray(
                jax.device_get(jax.random.key_data(state.rng))
            ),
        }
        if primary:
            if os.path.exists(path):
                shutil.rmtree(path)
            ckptr.save(path, host_tree)
            if own:
                ckptr.wait_until_finished()
        if own:
            # Synchronous semantics: every process returns only once the
            # checkpoint is durable (a non-primary might restore it next).
            _dist_barrier(f"mst-ckpt-durable-{index}")
        # Async (caller-owned checkpointer): non-primaries proceed; the
        # primary's at-most-one-in-flight discipline bounds staleness.
        return
    # Orbax wants the target dir to not exist.
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "rng": jax.device_get(jax.random.key_data(state.rng)),
    })
    if own:
        ckptr.wait_until_finished()


def _impl_for_key_data(shape, template_rng):
    """PRNG impl for stored key data: prefer the template's impl when the
    shapes agree; otherwise infer from the data width so checkpoints
    written under a different default (e.g. threefry runs predating the
    rbg default) keep resuming with THEIR impl instead of failing."""
    template_impl = jax.random.key_impl(template_rng)
    template_shape = jax.random.key_data(template_rng).shape
    if tuple(shape) == tuple(template_shape):
        return template_impl
    width = shape[-1] if shape else 0
    by_width = {2: "threefry2x32", 4: "rbg"}
    if width not in by_width:
        raise ValueError(f"unrecognized PRNG key data shape {shape}")
    return by_width[width]


def _host_template(tree):
    """Host-array restore target mirroring a (possibly sharded) template.

    device_get of a non-fully-replicated multi-process array is illegal,
    so sharded leaves become ShapeDtypeStructs (orbax reads the full value
    from disk on every process)."""
    def one(x):
        if isinstance(x, jax.Array) and not getattr(
            x.sharding, "is_fully_addressable", True
        ):
            return jax.ShapeDtypeStruct(x.shape, x.dtype)
        return np.asarray(jax.device_get(x))

    return jax.tree.map(one, tree)


def restore_checkpoint(
    model_folder: str, index: int, template: TrainState
) -> TrainState:
    """Restore params.{index} into the template's structure.

    Multi-process: collective — call from every process with the SHARDED
    template. When orbax's multihost protocol is live (honest world view,
    see save_checkpoint) the restore target carries the template's
    shardings as abstract arrays, so orbax/tensorstore reads each process
    ONLY its own shards and returns ready-sharded jax.Arrays — O(local
    shard) host memory and disk traffic, the mirror of the shard-native
    save. On the skewed backend every process reads the full host values
    from the shared filesystem, then places its own shards per the
    template's shardings (global_device_put).
    """
    path = checkpoint_path(model_folder, index)
    ckptr = ocp.StandardCheckpointer()
    # rng: take shape/dtype from the CHECKPOINT (impls differ in key-data
    # width: threefry (2,), rbg (4,)) so old runs restore under a new
    # default impl.
    meta = ckptr.metadata(path).item_metadata
    rng_meta = meta["rng"]
    multi = _multiprocess()
    honest = multi and jax.process_count() == (
        _dist_state().num_processes or 1
    )
    if honest:
        def abstract(tree):
            return jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(
                    x.shape, x.dtype, sharding=x.sharding
                ) if isinstance(x, jax.Array) else np.asarray(x),
                tree,
            )

        target = {
            "step": np.asarray(jax.device_get(template.step)),
            "params": abstract(template.params),
            "opt_state": abstract(template.opt_state),
            "rng": jax.ShapeDtypeStruct(rng_meta.shape, rng_meta.dtype),
        }
    elif multi:
        target = {
            "step": np.asarray(jax.device_get(template.step)),
            "params": _host_template(template.params),
            "opt_state": _host_template(template.opt_state),
            "rng": jax.ShapeDtypeStruct(rng_meta.shape, rng_meta.dtype),
        }
    else:
        target = {
            "step": np.asarray(template.step),
            "params": jax.device_get(template.params),
            "opt_state": jax.device_get(template.opt_state),
            "rng": jax.ShapeDtypeStruct(rng_meta.shape, rng_meta.dtype),
        }
    restored = ckptr.restore(path, target)
    params, opt_state = restored["params"], restored["opt_state"]
    if multi and not honest:
        from ..parallel.distributed import global_device_put

        def place(host_tree, tmpl_tree):
            return jax.tree.map(
                lambda h, t: global_device_put(h, t.sharding)
                if isinstance(t, jax.Array) else h,
                host_tree, tmpl_tree,
            )

        params = place(params, template.params)
        opt_state = place(opt_state, template.opt_state)
    return TrainState(
        step=jax.numpy.asarray(restored["step"]),
        params=params,
        opt_state=opt_state,
        rng=jax.random.wrap_key_data(
            jax.numpy.asarray(restored["rng"]),
            impl=_impl_for_key_data(rng_meta.shape, template.rng),
        ),
    )


def restore_params(model_folder: str, index: int, params_template):
    """Restore only model parameters (inference path, reference sampler.py:32-37)."""
    path = checkpoint_path(model_folder, index)
    ckptr = ocp.StandardCheckpointer()
    # Build a concrete target from the checkpoint's own metadata (a bare
    # targetless restore triggers orbax's UNSAFE-deserialization warning
    # on every inference-model load).
    meta = ckptr.metadata(path).item_metadata
    target = jax.tree.map(lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta)
    restored = ckptr.restore(path, target)
    params = restored["params"]
    want = jax.tree_util.tree_structure(jax.device_get(params_template))
    got = jax.tree_util.tree_structure(params)
    if want != got:
        raise ValueError(
            f"checkpoint params structure mismatch: {got} vs template {want}"
        )
    return params


def prune_checkpoints(model_folder: str, keep: int) -> None:
    """Delete all but the ``keep`` newest params.N directories (0 keeps
    everything — the reference's behavior; it never prunes)."""
    if keep <= 0:
        return
    import shutil

    indices = checkpoint_indices(model_folder)
    for idx in indices[:-keep]:
        shutil.rmtree(checkpoint_path(model_folder, idx), ignore_errors=True)


def try_latest(model_folder: str) -> Optional[int]:
    try:
        return get_latest_checkpoint_index(model_folder)
    except (ValueError, FileNotFoundError):
        return None
