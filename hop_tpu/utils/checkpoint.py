"""Checkpoint save/load with orbax.

Replaces the reference's torch.save-on-best-FGD (run_ted.py:454-462) and its
HA2G-format checkpoint consumers (load_checkpoint.py:19-45,
train_utils_expressive.py:191-244). Unlike the reference (save-only, no
resume, SURVEY.md §5.4), checkpoints carry params, optimizer state, batch
stats and metadata so training resumes after preemption — the natural TPU
requirement.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

FROZEN_KEY = "llm"


def strip_frozen(state: Any, key: str = FROZEN_KEY):
    """Drop the frozen LLM subtree from a train state before saving.

    The HOP backbone is frozen (reference HOP.py:90-91) and fully
    reconstructible from config + the HF weight converter, so persisting
    its ~270 MB with every checkpoint only slows saves/restores (the
    reference's torch.save has the same redundancy). Returns
    ``(stripped_state, frozen_subtree_or_None)``; no-op for states without
    a ``gen_params[key]`` dict (all baseline models).
    """
    gp = getattr(state, "gen_params", None)
    if isinstance(gp, dict) and key in gp:
        gp = dict(gp)
        frozen = gp.pop(key)
        return state.replace(gen_params=gp), frozen
    return state, None


def reattach_frozen(state: Any, frozen: Any, key: str = FROZEN_KEY):
    """Inverse of strip_frozen (pass the subtree from a fresh model init)."""
    if frozen is None:
        return state
    gp = dict(state.gen_params)
    gp[key] = frozen
    return state.replace(gen_params=gp)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))
        self._best_path = self.directory / "best_metrics.json"

    # static run metadata (model name, speaker count, ...) merged into every
    # save's metadata dict; set by the training entry point
    metadata: dict = None

    def save(self, step: int, state: Any, metadata: Optional[dict] = None):
        self._mgr.save(step, args=ocp.args.StandardSave({"state": state}))
        self._mgr.wait_until_finished()
        # metadata sidecar written only AFTER the arrays are durable: a
        # preemption mid-save must not leave run_metadata pointing at an
        # epoch the array store never finished (resume would silently
        # skip epochs otherwise)
        merged = dict(self.metadata or {})
        merged.update(metadata or {})
        if merged:
            (self.directory / "run_metadata.json").write_text(
                json.dumps({k: v for k, v in merged.items()
                            if isinstance(v, (str, int, float, bool))}))

    def run_metadata(self) -> dict:
        p = self.directory / "run_metadata.json"
        return json.loads(p.read_text()) if p.exists() else {}

    def restore(self, step: Optional[int] = None, template: Any = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore({"state": template}))
        return _unbox_partitioned(self._mgr.restore(step))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def record_best(self, metric_name: str, value: float, step: int) -> bool:
        """Track best-so-far (lower is better, like FGD). Returns True when
        `value` improves, mirroring the reference's save-on-best gate."""
        best = {}
        if self._best_path.exists():
            best = json.loads(self._best_path.read_text())
        improved = value < best.get(metric_name, float("inf"))
        if improved:
            best[metric_name] = value
            best[f"{metric_name}_step"] = step
            self._best_path.write_text(json.dumps(best, indent=1))
        return improved


def _unbox_partitioned(tree: Any) -> Any:
    """Template-free orbax restores turn flax nn.Partitioned boxes into
    {'value': array} dicts (the 'names' metadata isn't an array); collapse
    them back to plain arrays."""
    if isinstance(tree, dict):
        if set(tree.keys()) == {"value"}:
            return _unbox_partitioned(tree["value"])
        return {k: _unbox_partitioned(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_unbox_partitioned(v) for v in tree)
    return tree


def save_arrays(path: str, tree: Any):
    """Flat .npz save of a pytree (frozen feature nets, exported weights)."""
    flat = {}
    for keypath, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_arrays(path: str, template: Any) -> Any:
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    flat = {}
    for keypath, _ in jax.tree_util.tree_leaves_with_path(template):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        flat[name] = data[name]
    new_leaves = [flat[k] for k in
                  ["/".join(str(getattr(kk, "key", getattr(kk, "idx", kk)))
                            for kk in kp)
                   for kp, _ in jax.tree_util.tree_leaves_with_path(template)]]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
