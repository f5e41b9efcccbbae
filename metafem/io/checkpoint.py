"""Checkpoint / resume of the full solver state.

The reference has no checkpointing (SURVEY §5.4) — its closest mechanism
is the assemble_X!/dessemble_X! state sync plus per-step VTK dumps.  Here
a checkpoint captures everything needed to resume a run exactly: the
global x/dx (all time levels), t/dt, every named controlpoint column per
workpiece, the user history pytree (e.g. plasticity state), and the
global material constants.  Stored as a single .npz (portable, no extra
deps); mesh/physics are reconstructed by re-running the setup script, as
with orbax-style parameter checkpoints.
"""

from __future__ import annotations

import json

import numpy as np

_VERSION = 1


def _flatten_user(user, prefix="user"):
    out = {}
    if isinstance(user, dict):
        for k, v in user.items():
            out.update(_flatten_user(v, f"{prefix}.{k}"))
    else:
        out[prefix] = np.asarray(user)
    return out


def _unflatten_user(arrays, prefix="user"):
    tree: dict = {}
    for key, v in arrays.items():
        if not key.startswith(prefix + "."):
            continue
        parts = key[len(prefix) + 1:].split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v if v.ndim else v.item()
    return tree


def save_checkpoint(domain, path: str) -> None:
    arrays = {"x": np.asarray(domain.x), "dx": np.asarray(domain.dx)}
    meta = {"version": _VERSION, "t": domain.t, "dt": domain.dt,
            "global_vars": {k: float(v)
                            for k, v in domain.global_vars.items()},
            "n_workpieces": len(domain.workpieces)}
    for i, wp in enumerate(domain.workpieces):
        for name, col in wp.mesh.fields.items():
            arrays[f"wp{i}.{name}"] = np.asarray(col)
    arrays.update(_flatten_user(domain.user_state))
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_checkpoint(domain, path: str) -> dict:
    """Restore a checkpoint into a domain that has been set up (meshed +
    compiled) with the same problem definition.  Returns the meta dict."""
    import jax.numpy as jnp
    data = np.load(path if str(path).endswith(".npz") else path + ".npz")
    meta = json.loads(bytes(data["__meta__"]).decode())
    if meta["version"] != _VERSION:
        raise ValueError(f"checkpoint version {meta['version']} != "
                         f"{_VERSION}")
    if meta["n_workpieces"] != len(domain.workpieces):
        raise ValueError("workpiece count mismatch")
    x = data["x"]
    if domain.x is not None and x.shape != domain.x.shape:
        raise ValueError(f"state shape mismatch: checkpoint {x.shape} vs "
                         f"domain {domain.x.shape}")
    domain.x = jnp.asarray(x, dtype=domain.dtype)
    domain.dx = jnp.asarray(data["dx"], dtype=domain.dtype)
    domain.t = meta["t"]
    domain.dt = meta["dt"]
    domain.global_vars.update(meta["global_vars"])
    for i, wp in enumerate(domain.workpieces):
        for name in list(wp.mesh.fields):
            key = f"wp{i}.{name}"
            if key in data:
                wp.mesh.fields[name][...] = data[key]
    user = _unflatten_user({k: data[k] for k in data.files
                            if k.startswith("user.")})
    if user:
        domain.user_state = user
    if domain.state is not None:
        domain.refresh_fields()
    return meta
