"""Checkpoint / resume.

Reference semantics (url_benchmark/pretrain.py:437-494): save a dict
{agent, global_step, global_episode, replay_loader}; partial reload via
``only``/``exclude``; auto-resume from the latest checkpoint. The reference
pickles whole Python objects (including the full replay buffer); here the
checkpoint is a clean array-tree format (flax msgpack):

  * ``agent.msgpack`` — the agent TrainState, restored against the live
    state's structure via flax.serialization (no fragile class pickling);
  * ``replay.msgpack`` — the ReplayState's arrays + static geometry in
    meta.json, restorable WITHOUT a pre-built template (a fresh workspace
    has no buffer yet; same auto-resume need as the reference,
    pretrain.py:306-310).

Atomic write: the checkpoint directory is staged as ``<name>.tmp`` and
renamed, so a preempted job never sees a half-written checkpoint.
"""

from __future__ import annotations

import json
import shutil
import time
import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
from flax import serialization


def _replay_raw(replay: tp.Any) -> tp.Dict[str, tp.Any]:
    return {
        "storage": dict(replay.storage),
        "ep_lengths": replay.ep_lengths,
        "n_episodes": replay.n_episodes,
        "idx": replay.idx,
    }


def _replay_from_raw(arrays: tp.Dict[str, tp.Any],
                     statics: tp.Dict[str, int]) -> tp.Any:
    from ..data.replay import ReplayState
    return ReplayState(
        storage={k: jnp.asarray(v) for k, v in arrays["storage"].items()},
        ep_lengths=jnp.asarray(arrays["ep_lengths"], jnp.int32),
        n_episodes=jnp.asarray(arrays["n_episodes"], jnp.int32),
        idx=jnp.asarray(arrays["idx"], jnp.int32),
        max_episodes=statics["max_episodes"],
        max_episode_length=statics["max_episode_length"],
    )


def save_checkpoint(path: tp.Union[str, Path], payload: tp.Dict[str, tp.Any],
                    exclude: tp.Sequence[str] = ()) -> None:
    """payload keys: agent (TrainState), replay (ReplayState or None),
    global_step, global_episode. ``exclude`` drops keys (reference
    save_checkpoint's exclude list, pretrain.py:437-449)."""
    path = Path(path)
    payload = {k: v for k, v in payload.items()
               if k not in exclude and v is not None}
    meta: tp.Dict[str, tp.Any] = {
        "keys": sorted(payload.keys()),
        "global_step": int(payload.get("global_step", 0)),
        "global_episode": int(payload.get("global_episode", 0)),
    }
    tmp = path.with_name(path.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    if "agent" in payload:
        (tmp / "agent.msgpack").write_bytes(
            serialization.to_bytes(jax.device_get(payload["agent"])))
    if "replay" in payload:
        replay = payload["replay"]
        meta["replay_statics"] = {
            "max_episodes": int(replay.max_episodes),
            "max_episode_length": int(replay.max_episode_length)}
        (tmp / "replay.msgpack").write_bytes(
            serialization.to_bytes(jax.device_get(_replay_raw(replay))))
    (tmp / "meta.json").write_text(json.dumps(meta))
    if path.exists():
        shutil.rmtree(path)
    tmp.rename(path)


def load_checkpoint(path: tp.Union[str, Path],
                    templates: tp.Optional[tp.Dict[str, tp.Any]] = None,
                    only: tp.Optional[tp.Sequence[str]] = None,
                    exclude: tp.Sequence[str] = ()) -> tp.Dict[str, tp.Any]:
    """Restore a checkpoint. ``templates['agent']`` provides the live state
    pytree for structure-faithful restore; the replay state is
    self-describing. Returns the restored subset plus
    global_step/global_episode (reference load_checkpoint semantics,
    pretrain.py:451-494)."""
    path = Path(path)
    templates = templates or {}
    # a leftover <name>.tmp means a save was interrupted mid-write; the
    # committed checkpoint at ``path`` is the valid one — clean the orphan.
    # Only a STALE tmp is an orphan: a fresh one is most likely a LIVE
    # writer mid-save (e.g. an analysis tool reading a running trainer's
    # folder), and deleting it under the writer corrupts the save.
    orphan = path.with_name(path.name + ".tmp")
    if orphan.exists():
        try:
            age = time.time() - orphan.stat().st_mtime
            if age > 900:
                shutil.rmtree(orphan)
        except OSError:
            pass  # racing a live writer — leave its tmp alone
    meta = json.loads((path / "meta.json").read_text())
    saved = [k for k in meta["keys"] if k not in ("global_step", "global_episode")]
    keys = [k for k in saved
            if (only is None or k in only) and k not in exclude]
    out: tp.Dict[str, tp.Any] = {
        "global_step": meta["global_step"],
        "global_episode": meta["global_episode"],
    }
    for k in keys:
        if k == "agent":
            if "agent" not in templates:
                raise ValueError("restoring 'agent' requires a template state")
            state = serialization.from_bytes(
                templates[k], (path / "agent.msgpack").read_bytes())
            out[k] = jax.tree.map(jnp.asarray, state)
        elif k == "replay":
            # self-describing: template is a raw dict with None leaves —
            # from_bytes returns numpy arrays for them
            raw = serialization.msgpack_restore(
                (path / "replay.msgpack").read_bytes())
            out[k] = _replay_from_raw(raw, meta["replay_statics"])
    return out
