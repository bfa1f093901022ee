"""Checkpointing with keep-best-by-metric semantics.

Replaces SpeechBrain's Checkpointer (reference: hparams/pretrain.yaml:110-116,
pretrain.py:185-187): recoverables are params, BN state, optimizer state,
NewBob scheduler state, and the epoch counter; ``save_and_keep_only`` keeps
the single best checkpoint by a minimized metric (WER). The finetune
warm-start (copy + WER reset; reference: finetune.py:250-258) is
``import_from`` with ``reset_meta``.

Storage: orbax for the array pytrees, JSON for scalar/host state.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_PREFIX = "CKPT"


def _save_checkpointer() -> ocp.Checkpointer:
    """Checkpointer for SAVING. Saves are gated to process 0 (harness), but
    orbax's default save path runs a global barrier across ALL processes —
    a lone process-0 call would deadlock a multi-host job. Scope the
    barrier to process 0 instead. Restores are called by every process and
    use the default (all-process) checkpointer."""
    if jax.process_count() > 1:
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0}))
    return ocp.PyTreeCheckpointer()


class Checkpointer:
    def __init__(self, checkpoints_dir: str):
        # No makedirs here: loading from a mistyped path must not leave
        # empty directories behind (dirs are created on the save paths).
        self.dir = os.path.abspath(checkpoints_dir)

    # -- enumeration --------------------------------------------------------

    def _ckpt_dirs(self) -> List[str]:
        if not os.path.isdir(self.dir):
            return []
        return sorted(
            os.path.join(self.dir, d) for d in os.listdir(self.dir)
            if d.startswith(CKPT_PREFIX)
            and os.path.exists(os.path.join(self.dir, d, "meta.json")))

    def _read_meta(self, path: str) -> Dict[str, Any]:
        with open(os.path.join(path, "meta.json")) as f:
            return json.load(f)

    # -- save ---------------------------------------------------------------

    def save(self, trees: Dict[str, Any], meta: Dict[str, Any],
             host_state: Optional[Dict[str, Any]] = None) -> str:
        """Save one checkpoint: `trees` are array pytrees (params, state,
        opt_state), `meta` are metrics, `host_state` is JSON-serializable
        (scheduler, epoch counter)."""
        # Count suffix must produce an UNUSED dir: after keep-only-best
        # deletions the dir count is non-monotonic, so two improving
        # epochs within the same wall-clock second could collide on the
        # same tag (orbax refuses to save into an existing destination).
        os.makedirs(self.dir, exist_ok=True)
        stamp = time.strftime("%Y-%m-%d+%H-%M-%S")
        count = len(self._ckpt_dirs())
        while os.path.exists(os.path.join(
                self.dir, f"{CKPT_PREFIX}+{stamp}+{count:02d}")):
            count += 1
        path = os.path.join(self.dir, f"{CKPT_PREFIX}+{stamp}+{count:02d}")
        os.makedirs(path)
        ckptr = _save_checkpointer()
        for name, tree in trees.items():
            ckptr.save(os.path.join(path, name),
                       jax.tree.map(np.asarray, tree))
        with open(os.path.join(path, "host_state.json"), "w") as f:
            json.dump(host_state or {}, f, indent=2)
        # meta.json is the checkpoint's COMMIT MARKER (it is written last
        # and _ckpt_dirs requires it), so it must appear atomically — a
        # kill mid-write must not leave a partial meta.json that makes the
        # dir enumerable but unparseable.
        tmp = os.path.join(path, ".meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"unixtime": time.time(), **meta}, f, indent=2)
        os.replace(tmp, os.path.join(path, "meta.json"))
        return path

    def save_and_keep_only(self, trees, meta, host_state=None,
                           min_keys: Tuple[str, ...] = ("WER",)) -> str:
        """Save, then delete every checkpoint that is not the best (lowest)
        on each of min_keys (union kept). Also sweeps INCOMPLETE CKPT dirs
        (no meta.json — meta is written last, so such a dir is the debris
        of a save killed mid-flight; resume already ignores them, this
        keeps them from accumulating). Safe: saves are sequential within
        the single saving process (process 0)."""
        os.makedirs(self.dir, exist_ok=True)
        # Sweep debris FIRST, unconditionally — the skip-save fast path
        # below must not let crashed-save dirs accumulate across runs
        # whose metric never improves again.
        for d in os.listdir(self.dir):
            full = os.path.join(self.dir, d)
            if (d.startswith(CKPT_PREFIX) and os.path.isdir(full)
                    and not os.path.exists(os.path.join(full,
                                                        "meta.json"))):
                shutil.rmtree(full)
        existing = self._ckpt_dirs()
        if existing:
            # Saving a checkpoint that keep-only-best would immediately
            # delete is pure waste — and it is EXPENSIVE waste: the save
            # device_gets every array (~200 MB for the full model, seconds
            # through a remote-device transport) before writing. Skip the
            # save unless this epoch strictly improves some min_key
            # (identical surviving-checkpoint set either way: ties keep
            # the OLDER checkpoint, matching min()'s first-wins order).
            inf = float("inf")
            improves = any(
                float(meta.get(k, inf)) < min(
                    float(self._read_meta(c).get(k, inf))
                    for c in existing)
                for k in min_keys)
            if not improves:
                return self.best_path(min_keys[0]) or existing[0]
        path = self.save(trees, meta, host_state)
        ckpts = self._ckpt_dirs()
        keep = set()
        for key in min_keys:
            with_key = [(self._read_meta(c).get(key, float("inf")), c)
                        for c in ckpts]
            keep.add(min(with_key, key=lambda x: x[0])[1])
        for c in ckpts:
            if c not in keep:
                shutil.rmtree(c)
        return path

    # -- load ---------------------------------------------------------------

    def best_path(self, min_key: str = "WER") -> Optional[str]:
        ckpts = self._ckpt_dirs()
        if not ckpts:
            return None
        return min(ckpts,
                   key=lambda c: self._read_meta(c).get(min_key,
                                                        float("inf")))

    def latest_path(self) -> Optional[str]:
        ckpts = self._ckpt_dirs()
        if not ckpts:
            return None
        return max(ckpts, key=lambda c: self._read_meta(c)["unixtime"])

    def load(self, path: str, templates: Dict[str, Any]):
        """Restore array pytrees (with `templates` giving structure/dtypes)
        plus (host_state, meta)."""
        ckptr = ocp.PyTreeCheckpointer()
        trees = {}
        for name, template in templates.items():
            target = jax.tree.map(np.asarray, template)
            trees[name] = jax.tree.map(
                jax.numpy.asarray,
                ckptr.restore(os.path.join(path, name), item=target))
        with open(os.path.join(path, "host_state.json")) as f:
            host_state = json.load(f)
        meta = self._read_meta(path)
        return trees, host_state, meta

    # -- warm start ---------------------------------------------------------

    def import_from(self, other_dir: str,
                    reset_meta: Optional[Dict[str, Any]] = None,
                    reset_host_state: Optional[Dict[str, Any]] = None
                    ) -> None:
        """Copy checkpoints from another save dir (finetune warm-start),
        optionally overwriting metric values (e.g. WER=100) and host state
        (e.g. epoch=0 — the reference's finetune drops the epoch counter
        from its recoverables, finetune.yaml vs pretrain.yaml:116, so
        finetuning restarts epoch counting).

        Imported checkpoints are marked fresh_optimizer=True in their
        host state: the reference's checkpointer recoverables EXCLUDE the
        optimizer (hparams/*.yaml:110-116), so a warm-started finetune
        runs its first epoch with a fresh Adadelta at the config's lr —
        Trainer.restore honors the marker by re-initializing opt_state
        instead of loading the pretrain run's annealed accumulators."""
        reset_host_state = dict(reset_host_state or {},
                                fresh_optimizer=True)
        os.makedirs(self.dir, exist_ok=True)
        other = Checkpointer(other_dir)
        for src in other._ckpt_dirs():
            dst = os.path.join(self.dir, os.path.basename(src))
            if os.path.exists(dst):
                shutil.rmtree(dst)
            shutil.copytree(src, dst)
            if reset_meta:
                meta = self._read_meta(dst)
                meta.update(reset_meta)
                with open(os.path.join(dst, "meta.json"), "w") as f:
                    json.dump(meta, f, indent=2)
            if reset_host_state:
                hs_path = os.path.join(dst, "host_state.json")
                with open(hs_path) as f:
                    host_state = json.load(f)
                host_state.update(reset_host_state)
                with open(hs_path, "w") as f:
                    json.dump(host_state, f, indent=2)
