"""Experiment logging: text log, TensorBoard scalars/audio, checkpoints,
wall-clock timers.

Capability parity with /root/reference/logger/saver.py: expdir management,
`log_info` (stdout + append-only log_info.txt), `log_value` (TB scalars),
`log_audio` (TB audio + wav files on disk), interval timers, global step, and
`save_model` -> model_{step}.ckpt / model_best.ckpt with a config.yaml dump
next to checkpoints (saver.py:33-36) so inference can rebuild the model.
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import numpy as np

from ..utils.config import DotDict, save_config
from .checkpoint import AsyncCheckpointer, save_checkpoint


class Saver:
    def __init__(self, args: DotDict, initial_global_step: int = 0):
        self.expdir = args.env.expdir
        self.sample_rate = args.data.sampling_rate
        self.global_step = initial_global_step
        self.init_time = time.time()
        self.last_time = time.time()
        # train.async_save: true -> overlap checkpoint writes with training
        self._async_ckpt = (
            AsyncCheckpointer() if bool(args.train.async_save) else None
        )

        os.makedirs(self.expdir, exist_ok=True)
        self.path_log_info = os.path.join(self.expdir, "log_info.txt")

        # dump config next to checkpoints (inference reads it back)
        save_config(os.path.join(self.expdir, "config.yaml"), args)

        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(os.path.join(self.expdir, "logs"))
        except Exception:
            pass  # tensorboard optional; text log always works

    def log_info(self, msg: str) -> None:
        print(msg)
        with open(self.path_log_info, "a") as f:
            f.write(msg + "\n")

    def log_value(self, dict_value: Dict[str, float]) -> None:
        if self.writer is not None:
            for k, v in dict_value.items():
                self.writer.add_scalar(k, float(v), self.global_step)

    def log_audio(self, dict_audio: Dict[str, np.ndarray]) -> None:
        from ..data.wavio import write_wav

        audio_dir = os.path.join(self.expdir, "audio")
        os.makedirs(audio_dir, exist_ok=True)
        for name, audio in dict_audio.items():
            audio = np.asarray(audio).reshape(-1)
            path = os.path.join(audio_dir, f"{self.global_step}_{name.replace('/', '_')}")
            if not path.endswith(".wav"):
                path += ".wav"
            write_wav(path, audio, self.sample_rate)
            if self.writer is not None:
                import torch

                self.writer.add_audio(
                    name,
                    torch.from_numpy(audio[None, :]),
                    self.global_step,
                    sample_rate=self.sample_rate,
                )

    def get_interval_time(self, update: bool = True) -> float:
        now = time.time()
        dt = now - self.last_time
        if update:
            self.last_time = now
        return dt

    def get_total_time(self, to_str: bool = True):
        total = time.time() - self.init_time
        if to_str:
            return str(int(total // 3600)).zfill(2) + time.strftime(
                ":%M:%S", time.gmtime(total)
            )
        return total

    def global_step_increment(self) -> None:
        self.global_step += 1

    def save_model(
        self, variables: dict, opt_state: Any = None, postfix: Optional[str] = None
    ) -> str:
        name = f"model_{postfix}.ckpt" if postfix else "model.ckpt"
        path = os.path.join(self.expdir, name)
        self.log_info(f" [*] model checkpoint saved: {path}")
        if self._async_ckpt is not None:
            self._async_ckpt.save(path, self.global_step, variables, opt_state)
        else:
            save_checkpoint(path, self.global_step, variables, opt_state)
        return path

    def finish(self) -> None:
        """Drain pending async checkpoint writes (call at end of training)."""
        if self._async_ckpt is not None:
            self._async_ckpt.close()
            self._async_ckpt = None
