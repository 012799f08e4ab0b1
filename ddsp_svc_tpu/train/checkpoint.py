"""Checkpointing: save/restore {step, model variables, optimizer state}.

Capability parity with the reference's Saver.save_model / logger.utils
(saver.py:83-87, utils.py:49-67): single-file checkpoints named
`model_{step}.ckpt` (+ `model_best.ckpt`), resume picks the max-step file
else best. Serialization is flax msgpack (pure arrays, no pickle), so
checkpoints are portable across hosts and safe to load.
"""
from __future__ import annotations

import os
import queue
import re
import threading
from typing import Any, Optional, Tuple

import numpy as np
import jax
from flax import serialization


def _host_payload(step: int, variables: dict, opt_state: Any = None) -> dict:
    """Snapshot device arrays to host numpy. Must run on the caller's thread
    *before* the next donated train step reuses the buffers."""
    return {
        "global_step": np.asarray(step, dtype=np.int64),
        "model": serialization.to_state_dict(jax.device_get(variables["params"])),
        "constants": serialization.to_state_dict(
            jax.device_get(variables.get("constants", {}))
        ),
        "optimizer": serialization.to_state_dict(jax.device_get(opt_state))
        if opt_state is not None
        else {},
    }


def _write_payload(path: str, payload: dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def save_checkpoint(
    path: str, step: int, variables: dict, opt_state: Any = None
) -> None:
    _write_payload(path, _host_payload(step, variables, opt_state))


class AsyncCheckpointer:
    """Overlap checkpoint encoding + disk writes with training.

    `save` snapshots device arrays to host synchronously (required: the
    jitted train step donates its buffers, so values must leave the device
    before the next step), then hands msgpack encoding and the atomic file
    write to a worker thread. At most `max_pending` writes queue before
    `save` blocks. Call `wait()` to drain (end of training, or before
    reading a just-written checkpoint back); worker errors re-raise there.
    """

    def __init__(self, max_pending: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max_pending)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, name="ckpt-writer", daemon=True
        )
        self._thread.start()

    def _worker(self) -> None:
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                path, payload = item
                _write_payload(path, payload)
            except BaseException as e:  # surfaced on the next save()/wait()
                self._err = e
            finally:
                self._q.task_done()

    def _check(self) -> None:
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async checkpoint write failed") from err

    def save(
        self, path: str, step: int, variables: dict, opt_state: Any = None
    ) -> None:
        self._check()
        self._q.put((path, _host_payload(step, variables, opt_state)))

    def wait(self) -> None:
        self._q.join()
        self._check()

    def close(self) -> None:
        self.wait()
        self._q.put(None)
        self._thread.join()


def _load_payload(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_checkpoint(
    path: str,
    params_template: Optional[dict] = None,
    opt_state_template: Any = None,
) -> Tuple[int, dict, Any]:
    """Returns (step, variables, opt_state). Templates restore pytree
    structure (NamedTuple optimizer states etc.)."""
    payload = _load_payload(path)
    step = int(payload["global_step"])
    params = payload["model"]
    constants = payload.get("constants", {})
    if params_template is not None:
        params = serialization.from_state_dict(params_template, params)
    variables = {"params": params}
    if constants:
        variables["constants"] = constants
    opt_state = None
    if opt_state_template is not None and payload.get("optimizer"):
        opt_state = serialization.from_state_dict(
            opt_state_template, payload["optimizer"]
        )
    return step, variables, opt_state


def restore_variables(path: str) -> dict:
    """Variables-only restore (inference)."""
    _, variables, _ = restore_checkpoint(path)
    return variables


def latest_checkpoint(expdir: str) -> Optional[str]:
    """Resume policy parity (logger/utils.py:52-66): max numeric
    model_{step}.ckpt, else model_best.ckpt, else None."""
    if not os.path.isdir(expdir):
        return None
    steps = []
    for name in os.listdir(expdir):
        m = re.fullmatch(r"model_(\d+)\.ckpt", name)
        if m:
            steps.append(int(m.group(1)))
    if steps:
        return os.path.join(expdir, f"model_{max(steps)}.ckpt")
    best = os.path.join(expdir, "model_best.ckpt")
    return best if os.path.isfile(best) else None
