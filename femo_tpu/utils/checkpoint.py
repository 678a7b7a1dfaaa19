"""Optimization checkpoint/resume.

The reference has no solver-state checkpointing (SURVEY.md §5: only XDMF
recorders + warm starts through persistent Function state).  This adds a
proper mechanism: design variables, state warm starts, optimizer iteration
counter, and objective history snapshot to a single .npz, restorable into a
Simulator — so a killed optimization resumes instead of restarting.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..config import config


def save_checkpoint(path: str, sim, problem=None, extra: dict | None = None):
    """Snapshot Simulator values (+ state-function warm starts) to .npz."""
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    payload = {f"value/{k}": np.asarray(v) for k, v in sim.values.items()}
    # state warm starts from FEA registries, if present
    model = sim.model
    for fea in getattr(model, "fea_list", []):
        for sname, s in fea.states_dict.items():
            payload[f"state/{sname}"] = np.asarray(s["function"].array)
        payload["opt_iter"] = np.asarray(fea.opt_iter)
    if problem is not None:
        hist = np.asarray([h["obj"] for h in problem.history])
        payload["history/obj"] = hist
    for k, v in (extra or {}).items():
        payload[f"extra/{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load_checkpoint(path: str, sim, problem=None) -> dict:
    """Restore a snapshot into a Simulator; returns the extras dict."""
    data = np.load(path)
    extras = {}
    model = sim.model
    for key in data.files:
        kind, _, name = key.partition("/")
        if kind == "value":
            sim.values[name] = jnp.asarray(data[key], config.jdtype)
        elif kind == "state":
            for fea in getattr(model, "fea_list", []):
                if name in fea.states_dict:
                    fea.states_dict[name]["function"].array = jnp.asarray(
                        data[key], config.jdtype)
        elif kind == "history" and problem is not None:
            problem.history = [
                {"obj": float(v), "time": 0.0} for v in data[key]]
        elif kind == "extra":
            extras[name] = data[key]
        elif key == "opt_iter":
            for fea in getattr(model, "fea_list", []):
                fea.opt_iter = int(data[key])
    return extras
