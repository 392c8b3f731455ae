"""Checkpoint / resume: params + optimizer state + scalings + loss history.

Parity: the reference's pervasive append-only JLD2 training files
(``wind_mixing/src/data_writing.jl:4-117`` — metadata + per-iteration losses
+ NNs + ADAM state; ``free_convection/src/training.jl:3-22`` — per-epoch NN
history) and their compaction (``wind_mixing/src/data_extraction.jl:1-150``).

Format: a directory per run with
- ``meta.json``       — static metadata (shapes, config, stage names)
- ``state.npz``       — flattened pytree leaves (params, optimizer state,
                        scalings) under deterministic keys
- ``history.jsonl``   — one JSON line per iteration (the 6 loss channels)

Pure numpy + json: deterministic, diff-able, and readable without JAX.
``load_checkpoint`` restores into a provided pytree skeleton (same treedef),
mirroring the "extract_NN" replay capability.

For multi-host / sharded production runs there is an optional **orbax**
backend (:func:`save_checkpoint_orbax` / :func:`load_checkpoint_orbax`):
orbax writes each shard from its owning host and restores with the arrays'
shardings, which the flat-npz format (host-gathered, single file) cannot do.
The npz format stays the default — single-chip runs don't need a
checkpoint *server*, and its files open anywhere.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np


@dataclasses.dataclass
class TrainingHistory:
    """Append-only per-iteration history writer (``history.jsonl``)."""

    path: str

    def append(self, record: dict):
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(directory: str, state, meta: dict | None = None):
    """Save a pytree ``state`` (params/opt-state/scalings) + json metadata."""
    os.makedirs(directory, exist_ok=True)
    arrays = _flatten_with_paths(state)
    np.savez(os.path.join(directory, "state.npz"), **arrays)
    with open(os.path.join(directory, "meta.json"), "w") as f:
        json.dump(meta or {}, f, indent=2, default=str)


def load_checkpoint(directory: str, skeleton):
    """Restore arrays into ``skeleton`` (a pytree with the same structure).

    Returns ``(state, meta)``.
    """
    data = np.load(os.path.join(directory, "state.npz"))
    flat, treedef = jax.tree_util.tree_flatten_with_path(skeleton)
    leaves = []
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = data[key]
        leaves.append(np.asarray(arr, dtype=np.asarray(leaf).dtype).reshape(np.shape(leaf)))
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    meta_path = os.path.join(directory, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def save_checkpoint_orbax(directory: str, state, meta: dict | None = None):
    """Sharded/multi-host checkpoint via orbax (``PyTreeCheckpointer``).

    Each host writes only the shards it owns, so this scales to pod-size
    meshes where gathering to one ``state.npz`` would not. ``meta.json``
    sits next to the orbax tree, same as the npz format.
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    ocp.PyTreeCheckpointer().save(os.path.join(directory, "orbax"), state, force=True)
    with open(os.path.join(directory, "meta.json"), "w") as f:
        json.dump(meta or {}, f, indent=2, default=str)


def load_checkpoint_orbax(directory: str, skeleton=None):
    """Restore an orbax checkpoint; returns ``(state, meta)``.

    With a ``skeleton``, leaves restore with the skeleton's shardings/dtypes
    (pass the abstract train state on a mesh to resume a sharded run);
    without one, arrays restore with the shardings recorded at save time.
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    path = os.path.join(directory, "orbax")
    if skeleton is None:
        state = ocp.PyTreeCheckpointer().restore(path)
    else:
        state = ocp.PyTreeCheckpointer().restore(path, item=skeleton)
    meta_path = os.path.join(directory, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def history_path(directory: str) -> TrainingHistory:
    os.makedirs(directory, exist_ok=True)
    return TrainingHistory(os.path.join(directory, "history.jsonl"))


def extract_checkpoint(run_dir: str, out_dir: str):
    """Compact an append-only run directory into a final "extracted" file.

    Parity: ``extract_NN`` (``wind_mixing/src/data_extraction.jl:1-150``) —
    pulls the final params + optimizer state + the FULL loss history out of a
    training run into one compact, self-contained directory: ``state.npz``
    (final leaves), ``meta.json`` (run metadata + ``n_iterations``), and
    ``losses.npz`` (each history channel as one dense array instead of one
    JSON line per iteration).
    """
    os.makedirs(out_dir, exist_ok=True)
    records = TrainingHistory(os.path.join(run_dir, "history.jsonl")).read()
    # Dense channels stay ALIGNED across heterogeneous records: index k of
    # every array is iteration k (missing values become NaN); bools are not
    # loss channels.
    numeric = lambda v: isinstance(v, (int, float)) and not isinstance(v, bool)  # noqa: E731
    keys = sorted({k for rec in records for k, v in rec.items() if numeric(v)})
    channels = {
        k: np.asarray([rec[k] if numeric(rec.get(k)) else np.nan for rec in records], np.float64)
        for k in keys
    }
    np.savez(os.path.join(out_dir, "losses.npz"), **channels)

    state_path = os.path.join(run_dir, "state.npz")
    if os.path.exists(state_path):
        data = np.load(state_path)
        np.savez(os.path.join(out_dir, "state.npz"), **{k: data[k] for k in data.files})
    # Params + optimizer state written by the trainer's checkpoint_dir
    # (parity: extract_NN also carries the ADAM state forward).
    train_state_path = os.path.join(run_dir, "train_state", "state.npz")
    if os.path.exists(train_state_path):
        data = np.load(train_state_path)
        np.savez(os.path.join(out_dir, "train_state.npz"), **{k: data[k] for k in data.files})

    meta = {}
    meta_path = os.path.join(run_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta["n_iterations"] = len(records)
    meta["extracted_from"] = os.path.abspath(run_dir)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_extracted_losses(out_dir: str) -> dict:
    """Read the dense loss-history arrays written by :func:`extract_checkpoint`."""
    data = np.load(os.path.join(out_dir, "losses.npz"))
    return {k: data[k] for k in data.files}
